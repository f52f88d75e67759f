"""Core eigensolver iteration: block (Jacobi-)Davidson under ``jit``.

TPU-native re-design of the reference's outer iteration
(``main_iter_Sprimme``, ``src/eigs/main_iter.c:176``; algorithm outline at
``main_iter.c:118-141``). The central differences from the C design:

* PRIMME's dynamic ``basisSize`` becomes a traced scalar ``b`` over
  fixed-shape ``[n, max_basis_size]`` arrays whose inactive columns are
  exactly zero; every kernel is a full-size MXU matmul compiled once.
* The outer/restart/expansion triple loop collapses into one
  ``lax.while_loop`` whose body does one Rayleigh-Ritz + candidate pass and
  then either *expands* the basis by a corrected block or *restarts* it —
  selected by ``lax.cond`` (no recompilation, no data-dependent Python).
* Rank-0-solve + broadcast (``solve_H_brcast``, ``src/eigs/
  solve_projection.c:657``) disappears: under SPMD the small projected
  problem is replicated and solved identically on every shard; the only
  collectives are the psums XLA inserts for row-sharded inner products.
* Locking/restart column reordering is permutation-by-argsort on
  coefficient matrices (compaction happens in the small ``[mmax, mmax]``
  coefficient space, never on the big ``[n, .]`` arrays directly).

Covered here: GD / GD+k (thick restart with previous-vector retention,
``restart.c:200``), Olsen preconditioning (``correction.c:718``), soft and
hard locking (``restart_soft_locking:598`` / ``restart_locking:832``),
extreme and interior targets, generalized problems (B-ortho), external
deflation constraints (``numOrthoConst``), initial guesses, and block
Krylov initialization (``init.c:125``). The JD inner QMR solver plugs in
via the ``inner_solve`` hook (see ``core/inner.py``).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..params import (PrimmeParams, Target, ConvTest, Projection,
                      InitBasisMode)
from . import linalg as la
from .linalg import (Candidates, bcomb, col_mask, gram, mask_cols,
                     real_dtype, machine_eps, solve_H_rr, solve_H_refined,
                     solve_H_harmonic, solve_H_normal, orthonormalize_coeffs,
                     block_ortho, compute_residuals, target_sort_keys, _herm,
                     shifted_qr_R)



def _i32(x):
    return jnp.asarray(x, jnp.int32)


def _dus(X, U, i, j):
    """dynamic_update_slice with int32-normalized indices."""
    return jax.lax.dynamic_update_slice(X, U, (_i32(i), _i32(j)))


def _ds(X, i, j, shape):
    return jax.lax.dynamic_slice(X, (_i32(i), _i32(j)), shape)


_BIG = 1 << 20  # stable-sort priority offset (int32-safe: 4*_BIG*mmax < 2^31 for mmax < 512)


class Stats(NamedTuple):
    """Per-solve counters (``primme_stats``, ``include/primme_eigs.h:109-135``).

    ``num_global_sum``/``volume_global_sum`` count the cross-device
    reductions GSPMD inserts for row-sharded Gram products and column
    norms (the reference's ``globalSumReal`` callback counters) —
    analytic per-branch counts, exact for the ops the solver issues.
    ``numBroadcast`` is zero by construction under SPMD (the projected
    solve is replicated, never solved-on-rank-0-and-broadcast) and is
    reported as 0 at the API layer. ``flops_dense`` counts the fused
    VWXR residual kernel (reference ``flopsDense``)."""

    num_outer_iterations: jax.Array
    num_restarts: jax.Array
    num_matvecs: jax.Array
    num_preconds: jax.Array
    num_inner_iterations: jax.Array
    num_locked: jax.Array
    num_random: jax.Array          # random-vector ortho recoveries
    num_resets: jax.Array          # basis resets (monotone; bounds cycles)
    anorm_estimate: jax.Array
    max_conv_tol: jax.Array        # adaptive accuracy floor (stats.maxConvTol)
    estimate_resid_error: jax.Array  # accumulated-roundoff estimate
    num_global_sum: jax.Array        # numGlobalSum
    volume_global_sum: jax.Array     # volumeGlobalSum (scalars reduced)
    flops_dense: jax.Array           # flopsDense (VWXR kernel flops)
    num_ortho_inner_prods: jax.Array  # numOrthoInnerProds
    est_min_eval: jax.Array          # estimateMinEVal
    est_max_eval: jax.Array          # estimateMaxEVal
    num_practical: jax.Array         # lockingIssue (weak-criterion accepts)
    num_probe_rounds: jax.Array      # spectrum-verification probe rounds run
    # 1 when the probe round budget ran out before two consecutive clean
    # rounds — the returned set is UNVERIFIED (the solver gave up probing,
    # it did not prove completeness); cleared if a later clean
    # verification latches. Surfaced so "verified" is never silently
    # conflated with "stopped checking".
    probe_exhausted: jax.Array
    # matvecs consumed by verification probing (filter + power bounds +
    # probe Davidson), INCLUDED in num_matvecs: subtract to compare the
    # solve cost itself against an unverified run / the reference
    num_probe_matvecs: jax.Array
    # 1 when spectrum verification was REQUESTED but the probe does not
    # cover this problem class (interior targets, normal operators):
    # the solve runs unverified like the reference, and that fact is a
    # visible stat rather than an implied one
    probe_unsupported: jax.Array

    @staticmethod
    def zeros(rdt):
        z = jnp.zeros((), jnp.int32)
        zr = jnp.zeros((), rdt)
        big = jnp.asarray(jnp.finfo(rdt).max, rdt)
        return Stats(z, z, z, z, z, z, z, z, zr, zr, zr,
                     z, zr, zr, zr, big, -big, z, z, z, z, z)


class ProbeResult(NamedTuple):
    found: jax.Array       # bool: a pair sorts strictly inside the set
    X: jax.Array           # [n, blk] probe Ritz block (inject when found)
    num_matvecs: jax.Array
    num_preconds: jax.Array
    # filter sanity: the Chebyshev-filtered start actually landed in the
    # amplified band (Rayleigh-quotient check). An invalid round — bad
    # spectral-range estimates made the filter amplify the wrong end —
    # must NOT count as a clean verification round.
    valid: jax.Array
    # spectral bounds used this round, handed back so run_segment can
    # cache them in SolverState (round-invariant: power iterations run
    # on the first round only)
    bnd_hi: jax.Array
    bnd_lo: jax.Array
    bnds_set: jax.Array    # bool: bnd_hi/lo are live (non-B path only)


class SolverState(NamedTuple):
    # Big sharded arrays [n, mmax] (BV aliases V when B is None)
    V: jax.Array
    W: jax.Array
    BV: jax.Array
    # Replicated small dense state
    H: jax.Array                 # [mmax, mmax] projected matrix V^H A V
    b: jax.Array                 # traced basis size
    prev_hvecs: jax.Array        # [mmax, kmax] +k retention candidates
    # Locked pairs / ortho constraints: columns [0, noc) are user
    # constraints, [noc, noc+num_locked) locked eigenpairs.
    evecs: jax.Array             # [n, lockmax]
    Bevecs: jax.Array
    locked_vals: jax.Array       # [lockmax - noc]
    locked_res: jax.Array
    num_locked: jax.Array
    # stagnation / reset tracking (main_iter.c:853-896 reset machinery)
    best_res: jax.Array          # best leading-candidate residual seen
    stall_restarts: jax.Array    # restarts without sufficient progress
    restarts_since_reset: jax.Array  # drives estimateResidualError (restart.c:437)
    # previous-iteration sorted Ritz values (locked ++ window), indexed by
    # absolute sorted position — feeds computeRobustShift's delta term
    # (src/eigs/correction.c:248-252 prevRitzVals)
    prev_ritz: jax.Array         # [lockmax + cwin]
    num_prev_ritz: jax.Array
    # Spectrum-verification probe (no reference analogue — the upstream
    # library, like any block Davidson with blockSize < multiplicity, can
    # silently return an incomplete degenerate cluster; measured on the
    # 32^3 Laplacian the reference misses 3-fold cluster members at
    # blockSize=2/ncv=24, every returned pair passing its residual test).
    # When the requested pairs first appear converged, the solver runs
    # ``_probe_subsolve``: a small out-of-band Davidson on the deflated
    # complement, started from a Chebyshev-filtered random block (fresh
    # randomness carries components of any unseen invariant direction —
    # GD/JD corrections alone preserve the complement of span(V) for
    # Hermitian A). A probe whose min Ritz value dips strictly inside the
    # returned set is *found* (a Rayleigh quotient upper-bounds the
    # deflated minimum — no convergence needed for the existence proof)
    # and its block is injected as guesses; ``done`` latches only after
    # two consecutive clean rounds with independent randomness.
    probe_ref: jax.Array         # real: ne-th best target key last verified
    probe_clean: jax.Array       # int32: consecutive rounds finding nothing
    # Round-invariant spectral bounds for the probe's Chebyshev filter
    # (upper bound on lambda_max / lower bound on lambda_min from
    # independent power iterations). The spectrum of A cannot change
    # between probe rounds, so these are measured ONCE on the first
    # round and carried here — every later round reuses them for zero
    # matvecs (they previously cost 12-24 matvecs per round).
    probe_bnd_hi: jax.Array      # real: cached upper bound on lambda_max
    probe_bnd_lo: jax.Array      # real: cached lower bound on lambda_min
    probe_bnds_set: jax.Array    # bool: bounds above are live
    verified: jax.Array          # bool: returned set survived probing
    give_up: jax.Array           # bool: stagnation bail-out (honest exit)
    # Per-inner-iteration event buffer (cfg.inner_trace_cap > 0):
    # [cap, blk, 3] = (Ritz-value estimate, eigenresidual estimate,
    # alive flag) recorded by the QMR loop each iteration, replayed to
    # the monitor after the outer iteration. [1, 1, 3] zeros when off.
    inner_trace: jax.Array
    # control
    key: jax.Array
    done: jax.Array
    stats: Stats


class EigsResult(NamedTuple):
    evals: jax.Array       # [num_evals]
    evecs: jax.Array       # [n, num_evals]
    resnorms: jax.Array    # [num_evals]
    stats: Stats



def _mv(Op, X):
    """Operator application under the ``pt_matvec`` profiler scope —
    measured in-solve time attribution (timeMatvec,
    ``include/primme_eigs.h:121``) via profiling.measure_breakdown."""
    with jax.named_scope("pt_matvec"):
        return Op.matmat(X)

def _rand_block(key, n, bs, dtype):
    rdt = real_dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        k1, k2 = jax.random.split(key)
        X = (jax.random.normal(k1, (n, bs), rdt)
             + 1j * jax.random.normal(k2, (n, bs), rdt)).astype(dtype)
    else:
        X = jax.random.normal(key, (n, bs), dtype)
    return X


def _filtered_rand_block(cfg: SolveConfig, A, key, dtype, suppress_lo,
                         suppress_hi, degree):
    """Chebyshev-filtered random block for verification-probe injection.

    A raw random vector carries only ~1/sqrt(n) weight of a missing
    eigendirection; when the spectral gap at the probe bar is small
    relative to the tolerance the probe pair can converge to the *next*
    eigenvalue while the hidden component (weight * gap < tol) never
    surfaces. Running the random block through T_d mapped to suppress
    [suppress_lo, suppress_hi] (the part of the spectrum already above /
    beyond the bar) amplifies every not-yet-suppressed component to O(1)
    combined weight, so a missing member appears as its own Ritz value
    within an iteration or two. Uses the solver's own tracked spectral
    range (stats.estimateMin/MaxEVal) for the band. ``degree`` is traced
    (sized so the band amplification beats the sqrt(n) bulk).

    The ``blk`` start columns are the last ``blk`` iterates of ONE
    Chebyshev recurrence on a single random vector (T_{d-blk+1}x ..
    T_d x) — a filtered Krylov block — rather than ``blk``
    independently filtered columns: every iterate carries the amplified
    missing-member component, the spanned subspace is what the probe
    Davidson consumes, and the cost drops from ``blk*degree`` to
    ``degree`` matvecs (measured equal detection power on the planted-
    member suite). Costs ``degree`` matvecs total (counted by caller)."""
    n, blk = cfg.n, cfg.blk
    x = _rand_block(key, n, 1, dtype)
    rdt = real_dtype(dtype)
    ctr = ((suppress_hi + suppress_lo) / 2).astype(rdt)
    hw = ((suppress_hi - suppress_lo) / 2).astype(rdt)
    hw = jnp.maximum(hw, jnp.asarray(jnp.finfo(rdt).tiny * 1e8, rdt))

    def t_apply(Y):
        return (_mv(A, Y) - ctr * Y) / hw

    y1 = t_apply(x)

    def rescale(y0, y1):
        sc = (1.0 / jnp.maximum(jnp.max(jnp.abs(y1)),
                                jnp.asarray(1e-30, rdt))).astype(dtype)
        return y0 * sc, y1 * sc

    # Main recurrence: plain 3-term steps. The overflow-guard rescale
    # (a full-array reduction + two scalings) runs every 8th step only —
    # per-step it would triple the loop's memory traffic and dominate
    # the probe's wall time (the Chebyshev growth rate the degree
    # formula targets is e^{ln(4 sqrt n)/deg} per step, so 8 unguarded
    # steps cannot overflow even with badly wrong band bounds).
    # tail length never exceeds the remaining degree budget (wide blocks
    # with a floor-clipped degree would otherwise run blk-1 extra,
    # uncounted steps past the documented degree)
    tail = jnp.minimum(blk - 1, degree - 1)
    steps_main = jnp.maximum(degree - 1 - tail, 0)

    def body(i, carry):
        y0, y1 = carry
        y2 = 2.0 * t_apply(y1) - y0
        return jax.lax.cond((i & 7) == 7, rescale,
                            lambda a, b: (a, b), y1, y2)

    y0, y1 = jax.lax.fori_loop(0, steps_main, body, (x, y1))

    if blk == 1:
        _, yd = rescale(y0, y1)
        return yd

    # Tail: the last (up to) blk-1 steps additionally collect each
    # iterate into the start-block buffer (rescaled together so column
    # magnitudes stay comparable). Columns not reached stay zero and
    # are replaced downstream by the probe's ortho pipeline.
    y0, y1 = rescale(y0, y1)
    buf0 = jnp.concatenate([jnp.zeros((n, blk - 1), dtype), y1], axis=1)

    def body_tail(i, carry):
        y0, y1, buf = carry
        y2 = 2.0 * t_apply(y1) - y0
        sc = (1.0 / jnp.maximum(jnp.max(jnp.abs(y2)),
                                jnp.asarray(1e-30, rdt))).astype(dtype)
        buf = jnp.concatenate([buf[:, 1:] * sc, y2 * sc], axis=1)
        return (y1 * sc, y2 * sc, buf)

    _, _, buf = jax.lax.fori_loop(0, tail, body_tail, (y0, y1, buf0))
    return buf


class SolveConfig(NamedTuple):
    """Static (trace-constant) solver configuration distilled from
    :class:`~primme_tpu.params.PrimmeParams` by :func:`make_config`."""

    n: int
    ne: int                 # num_evals
    mmax: int               # max_basis_size
    mrs: int                # min_restart_size
    blk: int                # max_block_size
    kmax: int               # max_prev_retain
    cwin: int               # candidate window width
    noc: int                # num ortho constraints
    lockmax: int
    locking: bool
    target: Target
    eps: float
    a_norm: float           # 0 -> estimate
    olsen: bool             # RightX projector: Olsen correction
    robust_shifts: bool
    max_outer: int
    max_matvecs: int
    # inner (JD/QMR) solve; 0 = GD
    max_inner: int
    conv_test: ConvTest
    rel_tol_base: float
    skewX: bool
    leftQ: bool
    leftX: bool
    skewQ: bool
    rightQ: bool
    projection: Projection
    hermitian: bool
    init_random: bool
    # primme_init_user (init.c:193-196): basis = user guesses padded with
    # random vectors up to maxBlockSize only (no Krylov fill to mrs)
    init_user: bool = False
    # ||B|| / ||B^-1|| user estimates for generalized problems:
    # problemNorm = aNorm * invBNorm (auxiliary_eigs.c:567), and the
    # deltaEig roundoff floor scales by 1/sqrt(BNorm) (auxiliary_eigs.c:625)
    b_norm: float = 0.0
    inv_b_norm: float = 0.0
    # Half-precision basis storage (set by setup_solver from the work
    # dtype, never by make_config): solve the projected problem as the
    # generalized pencil H y = theta (V^H B V) y because a bf16/f16 basis
    # is orthonormal only to storage eps (orth=explicit_I,
    # src/eigs/primme_c.c:304-319), and floor the convergence tolerance
    # at the storage-precision resolution.
    orth_explicit_I: bool = False
    eps_floor: float = 0.0
    # Spectrum-verification probe (see SolverState docstring): number of
    # extra pairs each probe round converges (0 disables probing) and the
    # round budget. probe_unsupported records a REQUESTED verification
    # the probe cannot serve (interior target / normal operator) for the
    # Stats surface.
    probe_extra: int = 0
    max_probe_rounds: int = 0
    probe_unsupported: int = 0
    # Per-inner-iteration monitor events (primme_event_inner_iteration,
    # src/eigs/inner_solve.c:491-500). The reference calls monitorFun
    # from inside the QMR loop; under XLA the loop is one fused device
    # program, so a host callback per inner iteration would serialize
    # it. TPU-native design: the QMR loop records (value, eres, alive)
    # per iteration into a bounded on-device ring buffer, replayed to
    # the monitor in one host callback per outer iteration — same
    # observability, no per-iteration sync. 0 disables recording.
    inner_trace_cap: int = 0


def make_config(p: PrimmeParams) -> SolveConfig:
    """Distill resolved params into trace constants."""
    mmax, blk, ne = p.max_basis_size, p.max_block_size, p.num_evals
    noc = p.num_ortho_const
    # Default round budget scales with k: every missed cluster member
    # costs one (productive, strictly-improving) displacement round —
    # with blockSize < multiplicity a solve can legitimately need O(k)
    # of them before the two final clean rounds.
    rounds = (p.num_evals + 6) if p.verify_spectrum < 0 else p.verify_spectrum
    # The probe subsolve covers Hermitian extreme-target problems
    # including largest_abs (the degenerate-cluster hazard class);
    # interior targets and normal operators run unverified like the
    # reference — recorded in Stats.probe_unsupported so "unverified" is
    # visible, never implied.
    probe_targets = (Target.smallest, Target.largest, Target.largest_abs)
    probe_ok = p.hermitian and p.target in probe_targets
    probe_extra = (min(blk, max(0, p.n - noc - ne))
                   if (rounds > 0 and probe_ok) else 0)
    cwin = min(mmax, ne + blk)
    return SolveConfig(
        n=p.n, ne=ne, mmax=mmax, mrs=p.min_restart_size, blk=blk,
        kmax=min(p.max_prev_retain, cwin), cwin=cwin, noc=noc,
        probe_extra=probe_extra, max_probe_rounds=rounds,
        probe_unsupported=int(rounds > 0 and not probe_ok),
        lockmax=noc + ne + cwin, locking=bool(p.locking), target=p.target,
        eps=p.eps, a_norm=p.a_norm, olsen=p.projectors.RightX,
        robust_shifts=p.robust_shifts,
        max_outer=min(p.max_outer_iterations, (1 << 31) - 1),
        max_matvecs=min(p.max_matvecs, (1 << 31) - 1),
        max_inner=p.max_inner_iterations, conv_test=p.conv_test,
        rel_tol_base=p.rel_tol_base, skewX=p.projectors.SkewX,
        leftQ=p.projectors.LeftQ, leftX=p.projectors.LeftX,
        skewQ=p.projectors.SkewQ, rightQ=p.projectors.RightQ,
        projection=p.projection, hermitian=p.hermitian,
        init_random=(p.init_basis_mode == InitBasisMode.random),
        init_user=(p.init_basis_mode == InitBasisMode.user),
        b_norm=p.b_norm, inv_b_norm=p.inv_b_norm)


# ---------------------------------------------------------------------------
# Basis initialization (init_basis, src/eigs/init.c:125)
# ---------------------------------------------------------------------------

def init_basis(A, B, cfg: SolveConfig, key, evecs, Bevecs, v0, dtype):
    """Block-Krylov initial basis (``init_block_krylov``,
    ``src/eigs/init.c:258``): V[:, :b0] spans {X0, A X0, A^2 X0, ...},
    B-orthonormal and orthogonal to the constraint columns of ``evecs``.
    Each A-application doubles as the W panel for the block it was applied
    to, so the whole init costs exactly ``b0`` matvec columns."""
    n, mmax, blk = cfg.n, cfg.mmax, cfg.blk
    if cfg.init_user:
        # primme_init_user (init.c:193-196): the basis is the user guesses,
        # padded with random vectors only up to maxBlockSize — no Krylov
        # continuation to minRestartSize.
        nguess = v0.shape[1] if v0 is not None else 0
        b0 = min(max(nguess, blk), mmax)
    else:
        b0 = max(min(cfg.mrs, mmax), min(blk, mmax))
    nb = -(-b0 // blk)  # ceil
    # over-allocate to a block multiple so the last (partial) block's panel
    # write never clamps onto earlier columns; sliced back to mmax below
    mal = max(mmax, nb * blk)
    cdt = la.compute_dtype(dtype)   # block math runs here; stores round
    V = jnp.zeros((n, mal), dtype)
    W = jnp.zeros((n, mal), dtype)
    # When B is None, BV is carried as a zero-width placeholder instead of
    # a duplicate of V: a [n, 0] leaf costs nothing, while a same-valued
    # second leaf in the while/fori carries doubles HBM for every n-sized
    # buffer (XLA cannot alias distinct carry leaves).
    BV = jnp.zeros((n, 0), dtype) if B is None else jnp.zeros((n, mal), dtype)

    key, k0 = jax.random.split(key)
    X = _rand_block(k0, n, blk, cdt)
    # User initial guesses fill the leading basis blocks; remaining blocks
    # continue the Krylov chain from the last block (init.c:125: V = [user
    # guesses, block Krylov]). Partial guess blocks leave zero columns,
    # which block_ortho replaces with random vectors.
    ngb = 0
    v0pad = None
    if v0 is not None:
        k0g = min(v0.shape[1], b0)
        ngb = -(-k0g // blk)
        v0pad = jnp.zeros((n, ngb * blk), cdt)
        v0pad = v0pad.at[:, :k0g].set(v0[:, :k0g].astype(cdt))
        X = jax.lax.dynamic_slice(v0pad, (0, 0), (n, blk))

    locked = ((evecs, Bevecs if B is not None else evecs)
              if cfg.noc > 0 else None)

    def body(i, carry):
        V, W, BV, X, key, nrand = carry
        key, kk = jax.random.split(key)
        bi = i * blk
        if cfg.init_random or cfg.init_user:
            # primme_init_random (include/primme_eigs.h:64-69): fill the
            # initial basis with random vectors instead of Krylov powers
            # (the LOBPCG presets prescribe this). init_user pads partial
            # guess blocks the same way (init.c:198-203).
            key, kr = jax.random.split(key)
            X = _rand_block(kr, n, blk, cdt)
        if v0pad is not None:
            gb = jax.lax.dynamic_slice(
                v0pad, (_i32(0), _i32(jnp.minimum(bi, (ngb - 1) * blk))),
                (n, blk))
            X = jnp.where(i < ngb, gb, X)
        nact = jnp.minimum(blk, b0 - bi).astype(jnp.int32)
        res = block_ortho(X, (V, BV if B is not None else V), locked,
                          nact, kk, Bop=B,
                          locked_count=_i32(cfg.noc))
        V2 = _dus(V, res.X.astype(V.dtype), 0, bi)
        BV2 = BV if B is None else _dus(BV, res.BX.astype(BV.dtype), 0, bi)
        Y = _mv(A, res.X)
        W2 = _dus(W, Y.astype(W.dtype), 0, bi)
        return (V2, W2, BV2, Y.astype(cdt), key,
                nrand + res.n_random.astype(jnp.int32))

    V, W, BV, _, key, nrand = jax.lax.fori_loop(
        0, nb, body, (V, W, BV, X, key, jnp.zeros((), jnp.int32)))
    V, W = V[:, :mmax], W[:, :mmax]
    BV = BV if B is None else BV[:, :mmax]
    b = jnp.asarray(b0, jnp.int32)
    H = gram(V, W)  # inactive rows/cols exactly zero already
    if cfg.hermitian:
        H = 0.5 * (H + _herm(H))
    return V, W, BV, H, b, key, jnp.asarray(b0, jnp.int32), nrand


# ---------------------------------------------------------------------------
# Candidate preparation (prepare_candidates, main_iter.c:1470)
# ---------------------------------------------------------------------------

class Window(NamedTuple):
    sol: la.ProjectedSolution
    cands: Candidates      # width cwin, sorted order
    conv: jax.Array        # [cwin] bool: converged target pair
    is_target: jax.Array   # [cwin] bool: pair index < remaining sought
    n_needed: jax.Array    # remaining sought pairs
    nconv: jax.Array       # converged targets in window
    tol: jax.Array
    passes: jax.Array      # [cwin] bool: live pair passing the residual
                           # test regardless of target position (probe sizing)
    live: jax.Array        # [cwin] bool: active AND unit-norm Ritz vector
                           # (excludes pairs supported on collapsed columns,
                           # whose residual is trivially ~0)


def _ortho_counts(cfg: SolveConfig, has_locked: bool):
    """Analytic globalSum / inner-product counts of ONE block_ortho call:
    2 CGS passes (basis Gram + optional locked Gram + CholeskyQR Gram)
    plus the initial reference norms and survivor norms. These are the
    reductions GSPMD inserts under row sharding (reference counterpart:
    ``globalSumReal`` counting in ``src/eigs/auxiliary_eigs.c:391``)."""
    blk = cfg.blk
    ngs = 2 * (1 + (1 if has_locked else 0) + 1) + 2
    vol = (2 * (cfg.mmax * blk
                + (cfg.lockmax * blk if has_locked else 0)
                + blk * blk) + 2 * blk)
    return ngs, float(vol)


def _tolerance(cfg: SolveConfig, anorm):
    """Default convergence test: ||r|| < max(eps, 2 macheps) * problemNorm
    (``convTestFunAbsolute``, ``src/eigs/primme_c.c:555-570``).
    ``cfg.eps_floor`` is the storage-precision resolution of a
    half-precision basis — residuals cannot resolve below it."""
    meps = machine_eps(anorm.dtype)
    eps = cfg.eps if cfg.eps > 0 else 1e4 * meps
    eps = max(eps, cfg.eps_floor)
    return jnp.maximum(eps, 2 * meps) * anorm


def prepare_window(cfg: SolveConfig, s: SolverState, shifts, has_B: bool,
                   convtest=None):
    """Projected solve + fused residuals + convergence flags for the
    current candidate window (``prepare_candidates``,
    ``src/eigs/main_iter.c:1470``). Probe-discovered extra pairs are
    targeted via the locking-intruder branch below, not a widened
    goal."""
    c = cfg.cwin
    sidx = jnp.minimum(s.num_locked, shifts.shape[0] - 1)
    if not cfg.hermitian:
        sol = solve_H_normal(s.H, s.b, cfg.target, shifts, sidx)
    elif cfg.projection == Projection.refined and not has_B:
        rdt = real_dtype(s.V.dtype)
        meps = machine_eps(s.V.dtype)
        # cluster gap test inputs (prepare_vecs, solve_projection.c:
        # 878-890): accuracy needed = max(maxConvTol achieved so far,
        # smallestResNorm/10, ~macheps_orth)
        big = jnp.asarray(jnp.finfo(rdt).max / 4, rdt)
        sres = jnp.where(s.best_res < big, s.best_res / 10.0, 0.0)
        conv_eps = jnp.maximum(jnp.maximum(s.stats.max_conv_tol, sres),
                               6.28 * meps)
        an0 = jnp.maximum(s.stats.anorm_estimate,
                          jnp.asarray(cfg.a_norm, rdt))
        an0 = jnp.where(an0 > 0, an0, 0.0)
        # per-pair refined at exact kappa conditioning from one
        # complement-panel QR (see linalg.complement_qr_R): each
        # pair refines at its own Rayleigh-Ritz value
        G = la.complement_qr_R(s.V, s.W, s.H, s.b)
        sol = solve_H_refined(s.H, G, s.b, cfg.target, shifts, sidx,
                              anorm=an0, conv_eps=conv_eps)
    elif cfg.projection in (Projection.refined, Projection.harmonic):
        # Harmonic (or refined with a mass matrix, which the reference
        # rejects outright, primme_c.c:519 ret -39 — served by harmonic
        # here): R factor of the QR of (A - tau B)V, fresh each iteration
        tau = shifts[sidx]
        R = shifted_qr_R(s.W, s.BV if has_B else s.V, s.b, tau)
        sol = solve_H_harmonic(s.H, R, s.b, cfg.target, shifts, sidx)
    else:
        G = (gram(s.V, s.BV if has_B else s.V)
             if cfg.orth_explicit_I else None)
        sol = solve_H_rr(s.H, s.b, cfg.target, shifts, sidx, G=G)
    hv_c = sol.hvecs[:, :c]
    hl_c = sol.hvals[:c]
    cands = compute_residuals(s.V, s.W, s.BV if has_B else None,
                              hv_c, hl_c)
    # a pair supported on collapsed (zero) basis columns has X ~ 0 and a
    # trivially tiny residual — it is not a pair at all
    active = sol.active[:c] & (cands.xnorms > 0.5)
    finite = jnp.where(active, jnp.where(jnp.isfinite(hl_c), hl_c, 0), 0)
    anorm_est = jnp.maximum(s.stats.anorm_estimate,
                            jnp.max(jnp.abs(finite)))
    # problemNorm (auxiliary_eigs.c:567): |B\A| — for generalized problems
    # with both user estimates, aNorm * invBNorm; otherwise the largest
    # |Ritz value| seen tracks |B\A| directly (Ritz values of the pencil).
    user_pnorm = (cfg.a_norm * cfg.inv_b_norm
                  if has_B and cfg.inv_b_norm > 0 else cfg.a_norm)
    anorm = (jnp.asarray(user_pnorm, anorm_est.dtype)
             if cfg.a_norm > 0 else anorm_est)
    # Adaptive accuracy floor: once a pair has converged at some residual
    # level (or accumulated restart roundoff reaches it), later pairs are
    # accepted at that level too (stats.maxConvTol semantics,
    # src/eigs/convergence.c:105-146, restart.c:434).
    tol = jnp.maximum(_tolerance(cfg, anorm), s.stats.max_conv_tol)
    n_needed = _i32(jnp.asarray(cfg.ne, jnp.int32)
                    - s.num_locked.astype(jnp.int32))
    if cfg.locking:
        # Verification-phase intruders: once ne pairs are locked, a
        # window pair sorting strictly inside the locked set (a probe-
        # discovered missing cluster member — the locked set cannot be
        # unlocked) must still be targeted and converged; extraction
        # then returns the best ne by target order across both pools.
        rdt_k = real_dtype(s.H.dtype)
        sidx_k = jnp.minimum(s.num_locked, shifts.shape[0] - 1)
        lkeys = target_sort_keys(s.locked_vals, cfg.target, shifts,
                                 sidx_k).astype(rdt_k)
        neg = jnp.asarray(-jnp.finfo(rdt_k).max, rdt_k)
        lmask = jnp.arange(lkeys.shape[0]) < s.num_locked
        worst_locked = jnp.max(jnp.where(lmask, lkeys, neg))
        wkeys_i = target_sort_keys(hl_c, cfg.target, shifts,
                                   sidx_k).astype(rdt_k)
        intr = active & (wkeys_i < worst_locked - tol)
        n_intr = _i32(jnp.sum(intr.astype(jnp.int32)))
        n_intr = jnp.where(s.num_locked >= cfg.ne, n_intr, 0)
        n_needed = _i32(jnp.clip(n_needed + n_intr, 0, c))
    if convtest is not None:
        # User convergence test (convTestFun, include/primme_eigs.h:245):
        # fn(evals [c], resnorms [c], tol, anorm_estimate) -> bool [c].
        passes = convtest(jnp.where(active, hl_c, 0), cands.resnorms, tol,
                          anorm_est)
    else:
        passes = cands.resnorms <= tol
    is_target = (jnp.arange(c) < n_needed) & active
    conv = passes & is_target
    if cfg.hermitian and cfg.target in (Target.closest_geq,
                                        Target.closest_leq):
        # Region filter (check_convergence, src/eigs/convergence.c:125-140):
        # refined/sigma ordering ignores the leq/geq side, so never accept
        # a pair whose value +- residual lies wholly outside the region.
        sh = shifts[sidx].astype(cands.resnorms.dtype)
        lv = jnp.real(jnp.where(active, hl_c, 0)).astype(
            cands.resnorms.dtype)
        if cfg.target == Target.closest_geq:
            in_region = lv + cands.resnorms >= sh
        else:
            in_region = lv - cands.resnorms <= sh
        conv = conv & in_region
    if cfg.locking or cfg.noc > 0:
        # "Practically converged" (check_practical_convergence,
        # src/eigs/convergence.c:238): locked pairs are only accurate to
        # tol themselves, so unconverged candidates floor at ~sqrt(nl)*tol.
        # A pair whose residual component OUTSIDE the locked space is below
        # tol is accepted (its remaining error lies in locked directions).
        Rp = la.prefix_project(s.Bevecs if has_B else s.evecs, s.evecs,
                               cands.R,
                               _i32(cfg.noc + s.num_locked))
        projres = jnp.real(jnp.linalg.norm(Rp, axis=0))
        attainable = jnp.sqrt(1.0 + cfg.noc
                              + s.num_locked.astype(tol.dtype)) * tol
        practical = (projres <= tol) & (cands.resnorms <= attainable)
        weak_only = practical & is_target & ~conv
        conv = conv | (practical & is_target)
    else:
        weak_only = jnp.zeros_like(conv)
    nconv = _i32(jnp.sum(conv.astype(jnp.int32)))

    # --- stats: comm volume, dense flops, spectrum-range estimates -------
    # (primme_stats parity: flopsDense counts the fused VWXR kernel,
    # numGlobalSum/volumeGlobalSum the reductions this window issued,
    # estimateMin/MaxEVal track the Ritz range, lockingIssue the
    # weak-criterion acceptances.)
    has_locked = cfg.locking or cfg.noc > 0
    fmul = 8.0 if jnp.issubdtype(s.V.dtype, jnp.complexfloating) else 2.0
    sdt = s.stats.volume_global_sum.dtype
    fl = fmul * cfg.n * cfg.mmax * c * (3 if has_B else 2) + 3.0 * cfg.n * c
    ngs = 2 + (1 if has_locked else 0) + (1 if cfg.orth_explicit_I else 0)
    vol = (2.0 * c + (float(cfg.lockmax * c) if has_locked else 0.0)
           + (float(cfg.mmax * cfg.mmax) if cfg.orth_explicit_I else 0.0))
    bigr = jnp.asarray(jnp.finfo(sdt).max, sdt)
    rv = jnp.real(jnp.where(active, jnp.where(
        jnp.isfinite(hl_c), hl_c, 0), 0)).astype(sdt)
    emin = jnp.min(jnp.where(active, rv, bigr))
    emax = jnp.max(jnp.where(active, rv, -bigr))
    stats = s.stats._replace(
        anorm_estimate=anorm_est,
        num_global_sum=_i32(s.stats.num_global_sum + ngs),
        volume_global_sum=s.stats.volume_global_sum + vol,
        flops_dense=s.stats.flops_dense + fl,
        est_min_eval=jnp.minimum(s.stats.est_min_eval, emin),
        est_max_eval=jnp.maximum(s.stats.est_max_eval, emax),
        num_practical=_i32(s.stats.num_practical
                           + jnp.sum(weak_only.astype(jnp.int32))))
    return Window(sol, cands, conv, is_target, n_needed, nconv, tol,
                  (passes & active) | conv, active), stats


def _kth_best_key(cfg: SolveConfig, s: SolverState, win: Window, shifts):
    """Target-sort key of the ne-th best pair among the locked pairs and
    the residual-passing window pairs — the value a verification-probe
    pair must beat (strictly, by the tolerance margin) to prove the
    returned set incomplete. ``+finfo.max`` when fewer than ne pairs
    exist."""
    rdt = real_dtype(s.H.dtype)
    big = jnp.asarray(jnp.finfo(rdt).max, rdt)
    sidx = jnp.minimum(s.num_locked, shifts.shape[0] - 1)
    lv = s.locked_vals
    lk = target_sort_keys(lv, cfg.target, shifts, sidx).astype(rdt)
    lk = jnp.where(jnp.arange(lv.shape[0]) < s.num_locked, lk, big)
    wk = target_sort_keys(win.sol.hvals[:cfg.cwin], cfg.target, shifts,
                          sidx).astype(rdt)
    wk = jnp.where(win.passes, wk, big)
    allk = jnp.sort(jnp.concatenate([lk, wk]))
    return allk[cfg.ne - 1]


# Probe subsolve budget: iterations of the out-of-band deflated Davidson.
# Each iteration costs blk matvecs (+ blk preconds); the Chebyshev-filtered
# start usually dips within the first few iterations when a member is
# missing, so the budget is a tail guard, not the expected cost.
_PROBE_ITERS = int(os.environ.get("PTPU_PROBE_ITERS", "32"))

# Power iterations for the filter-band spectral bounds. The solver's own
# est_min/max_eval track only the Ritz values it has SEEN — measured on
# the 64^3 Laplacian bench the solve finishes with est_max 8.77 while the
# true lambda_max is 11.99, so a filter band built on the estimate
# amplifies the unseen top of the spectrum (Chebyshev grows on BOTH sides
# of the window) and the probe starts ~3 decades above the bar: a false
# CLEAN. A short power iteration bounds the extreme to a few percent
# (x1.15 cushion covers the rest) for ~12 matvecs per probe round.
_POW_ITERS = 12


def _power_extreme(A, key, n, dtype, shift=None):
    """~lambda_max(A) (or of shift*I - A when ``shift`` is given) by
    ``_POW_ITERS`` power iterations; returns the last norm growth — an
    underestimate converging geometrically, cushioned by the caller."""
    rdt = real_dtype(dtype)
    v = _rand_block(key, n, 1, dtype)
    v = v / jnp.maximum(jnp.linalg.norm(v), jnp.finfo(rdt).tiny)

    def body(i, carry):
        v, _ = carry
        w = _mv(A, v)
        if shift is not None:
            w = shift.astype(dtype) * v - w
        nw = jnp.linalg.norm(w).real.astype(rdt)
        return w / jnp.maximum(nw, jnp.finfo(rdt).tiny), nw

    _, nrm = jax.lax.fori_loop(0, _POW_ITERS, body,
                               (v, jnp.zeros((), rdt)))
    return nrm


def _probe_subsolve(cfg: SolveConfig, A, B, K, s: SolverState, win: Window,
                    shifts, bar, margin, key) -> ProbeResult:
    """Out-of-band spectrum-verification probe (see SolverState docstring).

    Runs a small Davidson iteration on the complement of the converged
    set: a fresh random block — Chebyshev-filtered through the solver's
    tracked spectral range to amplify the not-yet-represented band
    (``_filtered_rand_block``) — is hard-deflated against the locked
    pairs and the converged window Ritz vectors, then refined with
    preconditioned-residual corrections in its own [n, pw] basis
    (untouched by the main loop's restarts). The probe reports *found*
    as soon as its best target-sorted Ritz value sorts strictly inside
    the returned set: a Rayleigh quotient bounds the deflated extreme
    eigenvalue, so no convergence is required for the existence proof.
    """
    from ..operators import apply_precond

    n, blk = cfg.n, cfg.blk
    # probe basis width: measured on the 64^3 bench's missing-cluster
    # scenario (member 2.3e-3 below the bar), pw=8 stalls above the bar
    # on 2/3 seeds even at 48 iterations while pw=32 dips by it 16-31 —
    # the [n, pw] probe basis is cheap (pw*n*4B), so width is the right
    # knob, not iterations
    pw = min(max(3 * blk, 32), 48)
    # large blocks: pw must hold at least the appended block plus a
    # retained subspace (compress keeps pw - blk columns; pw < 2*blk
    # would wipe the basis every compression, and pw < blk is a
    # trace-time _dus shape error)
    pw = max(pw, 2 * blk)
    has_B = B is not None
    cdt = win.cands.X.dtype
    rdt = real_dtype(cdt)
    sidx = jnp.minimum(s.num_locked, shifts.shape[0] - 1)
    z = jnp.zeros((), jnp.int32)

    has_locked = cfg.noc > 0 or cfg.locking
    locked = ((s.evecs, s.Bevecs if has_B else s.evecs)
              if has_locked else None)
    lcount = _i32(cfg.noc + s.num_locked)

    # --- start block: Chebyshev-filtered random --------------------------
    key, kf = jax.random.split(key)
    valid0 = jnp.ones((), jnp.bool_)
    bnd_hi, bnd_lo = s.probe_bnd_hi, s.probe_bnd_lo
    bnds_set = s.probe_bnds_set
    # fast_start: the start block provably carries O(1) weight of any
    # missing member (a Chebyshev filter at its DESIGN degree) — the
    # precondition for the slow-creep clean-round early exit. False for
    # unfiltered starts (generalized B) and when the degree hit the 512
    # clip (amplification below the 4*sqrt(n) design point).
    fast_start = jnp.zeros((), jnp.bool_)
    if has_B:
        Z0, mv0 = _rand_block(kf, n, blk, cdt), z
    elif cfg.target == Target.largest_abs:
        # Two-sided |.| threshold (largest_abs): the suppression window
        # is fixed by the bar and the target shift s — bar =
        # -|lambda_ne - s|, candidates satisfy |lambda - s| > -bar, so
        # suppress [s + bar + cut, s - bar - cut] (centred at s; s = 0
        # for plain which='LM'). No spectral-range estimates (and no
        # power iterations) are involved; anything the filter amplifies
        # on EITHER side is a legitimate candidate direction, which also
        # removes the wrong-end failure mode the one-sided sanity check
        # guards, leaving only the finiteness condition.
        sctr = jnp.real(shifts[jnp.minimum(sidx, shifts.shape[0] - 1)]
                        ).astype(rdt) if shifts.shape[0] else \
            jnp.zeros((), rdt)
        rdt_cut = jnp.maximum(8.0 * margin.astype(rdt),
                              1e-3 * jnp.maximum(-2.0 * bar, 0.0))
        s_lo = (sctr + bar + rdt_cut).astype(rdt)
        s_hi = (sctr + (-bar) - rdt_cut).astype(rdt)
        width = jnp.maximum(s_hi - s_lo, jnp.asarray(1e-30, rdt))
        ac = jnp.arccosh(1.0 + 2.0 * rdt_cut / width)
        need = float(math.log(4.0 * math.sqrt(n)))
        deg = jnp.clip((need / jnp.maximum(ac, 1e-6)).astype(jnp.int32) + 1,
                       8, 512)
        okf = s_hi > s_lo
        Z0 = jax.lax.cond(
            okf,
            lambda k: _filtered_rand_block(cfg, A, k, cdt, s_lo, s_hi, deg),
            lambda k: _rand_block(k, n, blk, cdt), kf)
        mv0 = jnp.where(okf, deg, z)
        valid0 = jnp.all(jnp.isfinite(Z0))
        fast_start = okf & (deg < 512)
    else:
        emin, emax = s.stats.est_min_eval, s.stats.est_max_eval
        # the tracked estimates only cover Ritz values the solve has SEEN;
        # bound the far end of the spectrum independently (power
        # iteration + 15% cushion) so the suppression window provably
        # covers it — an uncovered tail is AMPLIFIED by the filter and
        # the probe starts on the wrong end of the spectrum (measured:
        # est_max 8.77 vs true 11.99 on the 64^3 bench -> false clean).
        # The bounds are ROUND-INVARIANT: power iterations run only when
        # SolverState carries no cached bounds (first probe round).
        key, kp1, kp2 = jax.random.split(key, 3)

        def fresh_bounds(_):
            pmax = _power_extreme(A, kp1, n, cdt)
            hi = jnp.maximum(emax, 1.15 * pmax).astype(rdt)
            if cfg.target == Target.smallest:
                return hi, jnp.asarray(-jnp.inf, rdt), _i32(_POW_ITERS)
            # lower bound for emin via power iteration on (c I - A)
            pneg = _power_extreme(A, kp2, n, cdt, shift=hi)
            return hi, (hi - 1.15 * pneg).astype(rdt), _i32(2 * _POW_ITERS)

        bnd_hi, bnd_lo, mvb = jax.lax.cond(
            bnds_set, lambda _: (bnd_hi, bnd_lo, z), fresh_bounds, 0)
        emax_eff = jnp.maximum(emax, bnd_hi)
        emin_eff = (emin if cfg.target == Target.smallest
                    else jnp.minimum(emin, bnd_lo))
        span = jnp.maximum(emax_eff - emin_eff,
                           jnp.asarray(jnp.finfo(rdt).tiny * 1e8, rdt))
        # Sharpness beats iterations (measured on the 64^3 planted
        # missing-member scenario): cut = 5e-3*span (deg ~54) leaves
        # ~200 above-bar modes amplified and the Davidson misses the
        # member on 2/5 seeds at 40 its; cut = 1e-3*span (deg ~121)
        # shrinks the amplified band to the bar's neighborhood and
        # detection fires within 2-22 iterations on 5/5 seeds — a
        # cheaper round (fewer small-eigh Davidson steps) AND a sounder
        # one. Degree stays bounded: ~ln(4*sqrt(n))/acosh(1+2e-3).
        cut = jnp.maximum(8.0 * margin.astype(rdt), 1e-3 * span)
        if cfg.target == Target.smallest:
            s_lo, s_hi = bar + cut, emax_eff
        else:
            s_lo, s_hi = emin_eff, (-bar) - cut
        # degree sized so the band amplification beats the sqrt(n)-strong
        # suppressed bulk: d >= ln(4 sqrt(n)) / acosh(1 + 2 cut / width)
        width = jnp.maximum(s_hi - s_lo, jnp.asarray(1e-30, rdt))
        ac = jnp.arccosh(1.0 + 2.0 * cut / width)
        need = float(math.log(4.0 * math.sqrt(n)))
        deg = jnp.clip((need / jnp.maximum(ac, 1e-6)).astype(jnp.int32) + 1,
                       8, 512)
        okf = (emax_eff > emin_eff) & (s_hi > s_lo)
        Z0 = jax.lax.cond(
            okf,
            lambda k: _filtered_rand_block(cfg, A, k, cdt, s_lo, s_hi, deg),
            lambda k: _rand_block(k, n, blk, cdt), kf)
        mv0 = jnp.where(okf, deg + mvb, mvb)
        # filter sanity: the start must actually live in the amplified
        # band — its Rayleigh quotient below (above, for largest) the
        # suppression window. A round whose filter failed (spectral
        # bounds still wrong) must not count as verification evidence.
        nz2 = jnp.real(jnp.sum(Z0.conj() * Z0, axis=0))
        AZ0 = _mv(A, Z0)
        rq = jnp.real(jnp.sum(Z0.conj() * AZ0, axis=0)) / jnp.maximum(
            nz2, jnp.finfo(rdt).tiny)
        mv0 = _i32(mv0 + blk)
        # Filter sanity: the ONLY invalid outcome is a start stuck on
        # the far (forbidden) end of the window — that end should hold
        # no spectrum at all, so weight there proves the bounds missed
        # part of it (measured failure: RQ 11.9 vs s_hi 10.97 when
        # est_max read 8.77 against a true lambda_max of 11.99). A start
        # INSIDE the window is legitimate: at span exhaustion the whole
        # amplified band is converged and deflated away, so the random
        # block's surviving weight lies on suppressed directions — such
        # a round finds nothing and that clean answer is CORRECT (the
        # complement provably has no weight on the candidate side).
        qtr = 0.25 * (s_hi - s_lo)
        if cfg.target == Target.smallest:
            valid0 = jnp.min(rq) < s_hi - qtr      # not pinned at the top
        else:
            valid0 = jnp.max(rq) > s_lo + qtr      # not pinned at the bottom
        valid0 = valid0 | ~okf     # unfiltered random rounds stay valid
        # a non-finite filtered start (overflow/NaN anywhere in the
        # chain) can never certify anything — the round is inconclusive
        valid0 = valid0 & jnp.all(jnp.isfinite(Z0))
        # Cache the bounds ONLY while rounds validate them: an invalid
        # round proves the band (power-iteration underestimate — the
        # 1.15 cushion is not a guarantee) is wrong WHETHER it was fresh
        # or cached, so the flag tracks this round's verdict and a bad
        # cache is dropped for re-measurement with fresh randomness next
        # round (the self-healing the pre-caching design had).
        bnds_set = valid0
        fast_start = okf & (deg < 512)

    P0 = jnp.zeros((n, pw), cdt)
    WP0 = jnp.zeros((n, pw), cdt)
    BP0 = jnp.zeros((n, pw), cdt) if has_B else jnp.zeros((n, 0), cdt)

    # The probe's hazard class is directions OUTSIDE the solver's
    # subspace (GD/JD corrections preserve the complement of span(V) for
    # Hermitian A); anything inside span(V) is visible to the solver's
    # own RR and is surfaced by the normal candidate machinery. Deflate
    # against the WHOLE active basis (inactive columns are exactly zero,
    # Xc ⊂ span(V)) plus locked — deflating only the passing window
    # candidates leaves basis-resident directions that the probe then
    # "finds" forever (measured: n=17/k=16 churned to the round cap
    # re-finding a basis direction whose injection collapses).
    BVd = s.BV if has_B else s.V

    def deflate(Z):
        # one CGS pass: V is 2-orthonormal and probe detection only
        # needs the deflated component to O(tol) — the found block is
        # fully re-orthogonalized on injection (_append_probe_block)
        return Z - bcomb(s.V, gram(BVd, Z))

    def cond(carry):
        (_, _, _, _, t, found, *_rest) = carry
        return (t < _PROBE_ITERS) & ~found

    def step(carry):
        (P, WP, BP, w, t, found, Xb, Z, key, mv, npc, prev_key, stall,
         Hp) = carry

        def compress(args):
            # thick-restart truncation reuses the CARRIED projected
            # matrix (incrementally maintained below) — no [n, pw] Gram
            # recompute; the rotated Hp is a tiny pw^2 matmul
            P, WP, BP, w, Hp = args
            solc = solve_H_rr(Hp, w, cfg.target, shifts, sidx)
            kk = pw - blk
            C = (solc.hvecs[:, :kk]
                 * solc.active[:kk].astype(Hp.dtype)[None, :])
            Pn = jnp.zeros_like(P).at[:, :kk].set(bcomb(P, C))
            WPn = jnp.zeros_like(WP).at[:, :kk].set(bcomb(WP, C))
            BPn = (jnp.zeros_like(BP).at[:, :kk].set(bcomb(BP, C))
                   if has_B else BP)
            Hn = jnp.zeros_like(Hp).at[:kk, :kk].set(
                _herm(C) @ (Hp @ C))
            wn = jnp.minimum(w, _i32(kk))
            return Pn, WPn, BPn, wn, Hn

        P, WP, BP, w, Hp = jax.lax.cond(w + blk > pw, compress,
                                        lambda a: a, (P, WP, BP, w, Hp))
        key, kk2 = jax.random.split(key)
        # Renormalize after deflation: the one-sided Chebyshev amplifies
        # the FAR end of the band most (exponentially in degree), so the
        # filtered start is dominated by already-converged extreme
        # directions and the missing member survives deflation at only
        # ~amp-ratio norm (measured 0.4% on the 12^3 planted case) —
        # small enough for block_ortho's collapse logic to replace it
        # with randomness. Restoring unit scale first keeps the member
        # direction; genuinely-dead columns stay ~0 and fail the
        # complement certification below.
        nz_pre = jnp.sqrt(jnp.maximum(
            jnp.real(jnp.sum(Z.conj() * Z, axis=0)), 0.0))
        Zd = deflate(Z)
        floor = jnp.asarray(jnp.finfo(real_dtype(cdt)).tiny * 1e10,
                            real_dtype(cdt))
        nd_pre = jnp.sqrt(jnp.maximum(
            jnp.real(jnp.sum(Zd.conj() * Zd, axis=0)), 0.0))
        # a column whose deflated norm collapsed to a small FRACTION of
        # its pre-deflation norm is renormalization-amplified residue:
        # its direction may be single-pass-CGS roundoff with O(1)
        # span(V) overlap, so the cheap certification path below is not
        # sound for this iteration (see `suspect`)
        defl_shrunk = jnp.any(nd_pre < 1e-2 * jnp.maximum(
            nz_pre, jnp.finfo(real_dtype(cdt)).tiny))

        def _renorm(Y):
            yn = jnp.sqrt(jnp.maximum(
                jnp.real(jnp.sum(Y.conj() * Y, axis=0)), 0.0))
            return jnp.where((yn > floor)[None, :],
                             Y / jnp.maximum(yn, floor)[None, :], 0.0)

        Zd = _renorm(Zd)
        # The deflated columns are often nearly PARALLEL (the filter
        # amplifies the band's far end hardest, so after deflation every
        # column is dominated by the same strongest surviving
        # direction); a unit-norm parallel pair defeats CholeskyQR's
        # small-diagonal dead-column guard and NaNs the factor. One
        # in-block CGS pass first: duplicates collapse to ~0 columns,
        # which downstream certification drops cleanly.
        cols = []
        for j in range(blk):
            zj = Zd[:, j:j + 1]
            for zi in cols:
                zj = zj - zi * jnp.sum(zi.conj() * zj)
            zjn = jnp.sqrt(jnp.maximum(
                jnp.real(jnp.sum(zj.conj() * zj)), 0.0))
            cols.append(jnp.where(zjn > 1e-4, zj / jnp.maximum(
                zjn, floor), 0.0))
        Zd = jnp.concatenate(cols, axis=1)
        ores = block_ortho(Zd, (P, BP if has_B else P), locked,
                           _i32(blk), kk2, Bop=B, locked_count=lcount,
                           n_iters=1)
        # Count only columns CERTIFIED to live in the complement of
        # span(V) ∪ locked, compacted to the front. block_ortho's
        # replacement loop knows nothing about V: at span exhaustion it
        # emits unit-norm NUMERICAL-NOISE vectors (a random vector
        # orthogonalized against a spanning set leaves ~eps residual,
        # which normalization amplifies to norm 1) whose junk Ritz
        # values can sort under the bar (measured: n=17/k=16 churned to
        # the round cap on exactly these). Re-deflating certifies: a
        # genuine complement direction keeps norm ~1, noise re-deflates
        # to ~eps. The hazard class is block_ortho's random replacements
        # (ores.n_random > 0) AND renormalization-amplified deflation
        # residue (defl_shrunk — a column that deflated to a tiny
        # fraction of its norm may be pure CGS roundoff with O(1)
        # span(V) overlap after renorm, invisible to block_ortho which
        # never sees V). Only when NEITHER occurred are the columns
        # provably combinations of well-conditioned deflated content,
        # and the two [n, |V|] re-deflation passes are skipped.
        def full_cert(_):
            cert = ores.X - bcomb(s.V, gram(BVd, ores.X))
            if has_locked:
                cert = la.prefix_project(
                    s.Bevecs if has_B else s.evecs, s.evecs, cert,
                    lcount)
            return jnp.real(jnp.sum(cert.conj() * cert, axis=0))

        cn2p = jax.lax.cond(
            (ores.n_random > 0) | defl_shrunk, full_cert,
            lambda _: jnp.real(jnp.sum(ores.X.conj() * ores.X, axis=0)),
            0)
        srtp = jnp.argsort(jnp.arange(blk, dtype=jnp.int32)
                           + _BIG * ~(cn2p >= 0.25))   # NaN -> dropped
        srvp = _i32(jnp.sum((cn2p >= 0.25).astype(jnp.int32)))
        keepp = (jnp.arange(blk) < srvp)[None, :]
        # where(), not multiply: a NaN column (singular Cholesky inside
        # block_ortho at span exhaustion) times 0 is still NaN
        Xs = jnp.where(keepp, ores.X[:, srtp], 0)
        BXs = jnp.where(keepp, ores.BX[:, srtp], 0) if has_B else Xs
        P = _dus(P, Xs.astype(cdt), 0, w)
        BP = _dus(BP, BXs.astype(cdt), 0, w) if has_B else BP
        Y = _mv(A, Xs)
        WP = _dus(WP, Y.astype(cdt), 0, w)
        # count surviving columns only (the codebase convention for
        # post-collapse matvec accounting — do_expand counts nc,
        # _append_probe_block nc): dropped columns are zero vectors
        mv = _i32(mv + srvp)
        # Incremental projected-matrix update (replaces a full
        # gram(P, WP) per iteration): the new columns' Gram column
        # G = P^H Y lands at [:, w:w+blk], and its Hermitian transpose
        # at [w:w+blk, :] (A Hermitian — the probe only runs for
        # Hermitian problems; for generalized B the basis is
        # B-orthonormal so P^H W is Hermitian too). Rows/columns beyond
        # the active width stay exactly zero: dropped columns are zero
        # vectors and P's inactive columns are zero.
        G = gram(P, Y.astype(cdt))   # P already holds the new columns
        Hp = _dus(Hp, G, 0, w)
        Hp = _dus(Hp, _herm(G), w, 0)
        w = _i32(w + srvp)
        sol = solve_H_rr(Hp, w, cfg.target, shifts, sidx)
        hb = sol.hvals[:blk]
        keys = target_sort_keys(hb, cfg.target, shifts, sidx).astype(rdt)
        Cb = sol.hvecs[:, :blk]
        Xb = bcomb(P, Cb)
        # a pair supported on a collapsed (zero) probe column is not a
        # pair — at span exhaustion block_ortho's random replacement can
        # also collapse, leaving zero columns whose Ritz value is 0
        xb0 = jnp.real(jnp.linalg.norm(Xb[:, 0]))
        # Sound existence certificate. The candidate's own Ritz value is
        # NOT a bound on the deflated extreme: probe columns may carry
        # basis contamination (block_ortho knows nothing about V, and
        # certification above only requires >=0.5 complement norm), and
        # the cross term with a far-end converged eigenvalue biases the
        # Rayleigh quotient past the bar. Measured: mhd1280b-LA holds
        # 70.3 in the basis while the bar is 12.738 and the true
        # complement top is 12.248 — contaminated candidates read
        # RQ > bar and the probe "found" a nonexistent member for 11
        # straight rounds (round-4 false-positive churn). Certify on the
        # DEFLATED candidate instead: two CGS passes against span(V)
        # (+ locked) leave x̃ in the complement to O(eps), so RQ(x̃)
        # genuinely bounds the complement extreme. A true missing member
        # is already deflated (xdn ~ xb0) and passes unchanged. Costs
        # one extra matvec per probe iteration.
        pre_found = (sol.active[0] & (xb0 > 0.5)
                     & (keys[0] < bar - margin))

        def certify(_):
            xd = Xb[:, :1]
            for _i in range(2):
                xd = xd - bcomb(s.V, gram(BVd, xd))
                if has_locked:
                    xd = la.prefix_project(
                        s.Bevecs if has_B else s.evecs, s.evecs, xd,
                        lcount)
            xdn = jnp.sqrt(jnp.maximum(
                jnp.real(jnp.sum(xd.conj() * xd)), 0.0))
            xdu = jnp.where(xdn > floor, xd / jnp.maximum(xdn, floor), 0.0)
            Axd = _mv(A, xdu)
            tinyr = jnp.finfo(rdt).tiny
            if has_B:
                den = jnp.real(jnp.sum(xdu.conj() * B.matmat(xdu)))
            else:
                den = jnp.real(jnp.sum(xdu.conj() * xdu))
            rqd = (jnp.real(jnp.sum(xdu.conj() * Axd))
                   / jnp.maximum(den, tinyr))
            ckey = target_sort_keys(rqd[None], cfg.target, shifts,
                                    sidx).astype(rdt)[0]
            return ((xdn > 0.5 * xb0) & (ckey < bar - margin), _i32(1))

        cert_ok, cmv = jax.lax.cond(
            pre_found, certify,
            lambda _: (jnp.zeros((), jnp.bool_), _i32(0)), 0)
        mv = _i32(mv + cmv)
        found2 = pre_found & cert_ok
        lamb = jnp.where(jnp.isfinite(hb), hb, 0).astype(cdt)
        Rb = bcomb(WP, Cb) - (bcomb(BP, Cb) if has_B else Xb) * lamb[None, :]
        if K is not None:
            Z2 = apply_precond(K, Rb, jnp.real(lamb))
            npc = _i32(npc + blk)
        else:
            Z2 = Rb
        # Slow-creep early exit (a cost rule, not a soundness rule — the
        # planted-member detection suite gates it): a detection event
        # CRASHES the min Ritz key below the bar within a few
        # iterations, because the Chebyshev-filtered start carries O(1)
        # weight of any sub-bar member (measured trajectories: clean
        # 64^3 rounds creep 0.159 -> 0.0332 by ~1%-of-gap steps and
        # plateau far above the 0.0257 bar, while detection rounds open
        # below the bar at iteration 0-2). When the per-iteration
        # improvement of the min key has been under 10% of the remaining
        # distance to the bar for 3 consecutive iterations (after an
        # 8-iteration safety floor), even geometric extrapolation of
        # the creep cannot reach the bar — stop the round instead of
        # burning the full budget (~0.85 ms/iteration of [n, pw]
        # traffic at the 64^3 scale).
        gap = keys[0] - bar
        improved = (prev_key - keys[0]) > 0.10 * jnp.maximum(gap, margin)
        stall2 = jnp.where(improved, z, _i32(stall + 1))
        # gated on fast_start: the crash-vs-creep distinction only holds
        # when the filtered start provably carries O(1) member weight
        # (unfiltered generalized-B starts and degree-clipped filters
        # must run the full budget)
        clean_conv = (gap > margin) & (stall2 >= 3) & (t >= 8) & fast_start
        if os.environ.get("PTPU_PROBE_DEBUG") == "2":
            jax.debug.print(
                "  it {t}: key0={k} bar={b} stall={s} srvp={v}",
                t=t, k=keys[0], b=bar, s=stall2, v=srvp)
        # srvp == 0 means even the random replacements collapsed — the
        # complement of P ∪ locked ∪ V is (numerically) empty, no further
        # iteration can find anything: exit the round early
        t_next = jnp.where((srvp == 0) | clean_conv,
                           _i32(_PROBE_ITERS), _i32(t + 1))
        return (P, WP, BP, w, t_next, found | found2, Xb, Z2, key, mv,
                npc, jnp.minimum(prev_key, keys[0]), stall2, Hp)

    carry = (P0, WP0, BP0, z, z, jnp.zeros((), jnp.bool_),
             jnp.zeros((n, blk), cdt), Z0, key, mv0, z,
             jnp.asarray(jnp.finfo(rdt).max, rdt), z,
             jnp.zeros((pw, pw), cdt))
    carry = jax.lax.while_loop(cond, step, carry)
    (_, _, _, _, _, found, Xb, _, _, mv, npc, _, _, _) = carry
    return ProbeResult(found=found, X=Xb, num_matvecs=mv, num_preconds=npc,
                       valid=valid0, bnd_hi=bnd_hi, bnd_lo=bnd_lo,
                       bnds_set=bnds_set)


def _append_probe_block(cfg: SolveConfig, A, B, s: SolverState,
                        Xb) -> SolverState:
    """Inject a found probe block as new basis columns at ``s.b``
    (caller guarantees ``s.b + blk <= mmax``). The injected pair's Ritz
    value sorts inside the current set, so the main loop targets and
    converges it like any candidate."""
    blk = cfg.blk
    key, kk = jax.random.split(s.key)
    locked = ((s.evecs, s.Bevecs if B is not None else s.evecs)
              if (cfg.noc > 0 or cfg.locking) else None)
    ores = block_ortho(Xb, (s.V, s.BV if B is not None else s.V), locked,
                       _i32(blk), kk, Bop=B,
                       locked_count=_i32(cfg.noc + s.num_locked))
    # compact surviving columns to the front and only count those — at
    # span exhaustion even random replacements collapse to zero, and a
    # zero column counted in b shows up as a fake converged 0-pair
    cn2 = jnp.real(jnp.sum(ores.X.conj() * ores.X, axis=0))
    # ~(cn2 >= 0.25), not (cn2 < 0.25): both drop small columns, but only
    # the former also penalizes NaN columns in the ordering (NaN fails
    # every comparison), keeping srt consistent with the nc count below
    srt = jnp.argsort(jnp.arange(blk, dtype=jnp.int32)
                      + _BIG * (~(cn2 >= 0.25)).astype(jnp.int32))
    nc = _i32(jnp.sum((cn2 >= 0.25).astype(jnp.int32)))
    # where(), not multiply: a NaN column (singular Cholesky inside
    # block_ortho at span exhaustion) times 0 is still NaN and would
    # poison the basis slice it is written into
    keepf = (jnp.arange(blk) < nc)[None, :]
    Xs = jnp.where(keepf, ores.X[:, srt], 0)
    BXs = jnp.where(keepf, ores.BX[:, srt], 0) if B is not None else Xs
    V = _dus(s.V, Xs.astype(s.V.dtype), 0, s.b)
    BV = (_dus(s.BV, BXs.astype(s.BV.dtype), 0, s.b)
          if B is not None else s.BV)
    Y = _mv(A, Xs)
    W = _dus(s.W, Y.astype(s.W.dtype), 0, s.b)
    hc = gram(V, Y)
    H = _dus(s.H, hc, 0, s.b)
    if cfg.hermitian:
        H = _dus(H, _herm(hc), s.b, 0)
    else:
        hr = gram(Xs, W)
        H = _dus(H, hr, s.b, 0)
    stats = s.stats._replace(
        num_matvecs=_i32(s.stats.num_matvecs + nc))
    return s._replace(V=V, W=W, BV=BV, H=H, b=_i32(s.b + nc),
                      key=key, stats=stats)


def _unconverged_order(win: Window):
    """Stable order with unconverged active pairs first (natural sorted
    order preserved within each class), converged next, padding last."""
    c = win.conv.shape[0]
    idx = jnp.arange(c, dtype=jnp.int32)
    active = win.live
    key = idx + _BIG * win.conv.astype(jnp.int32) \
        + 4 * _BIG * (~active).astype(jnp.int32)
    return jnp.argsort(key)


# ---------------------------------------------------------------------------
# Correction equation (solve_correction, src/eigs/correction.c:134)
# ---------------------------------------------------------------------------

def gd_correction(cfg: SolveConfig, K, R, X, sigma, valid):
    """Generalized-Davidson expansion vectors: (Olsen-)preconditioned
    residuals (``correction.c:718``). ``sigma`` are the (robust) shifts fed
    to the preconditioner (``ShiftsForPreconditioner``)."""
    from ..operators import apply_precond

    if K is None:
        return R * valid[None, :].astype(R.dtype)
    KR = apply_precond(K, R, sigma)
    if not cfg.olsen:
        return KR * valid[None, :].astype(R.dtype)
    # Olsen: delta = K^{-1} r - (x^H K^{-1} r / x^H K^{-1} x) K^{-1} x
    KX = apply_precond(K, X, sigma)
    num = jnp.sum(X.conj() * KR, axis=0)
    den = jnp.sum(X.conj() * KX, axis=0)
    den = jnp.where(jnp.abs(den) < jnp.finfo(real_dtype(R.dtype)).tiny,
                    1.0, den)
    D = KR - KX * (num / den)[None, :]
    return D * valid[None, :].astype(R.dtype)


def _robust_shifts(cfg: SolveConfig, s: SolverState, win: Window,
                   cand_idx, lam, res, valid, shifts):
    """Correction-equation shifts (``solve_correction`` shift logic +
    ``computeRobustShift``, ``src/eigs/correction.c:176-320,481-606``).

    Extreme targets with robustShifts: Davis–Kahan shift
    ``lambda -/+ epsilon`` with ``epsilon = min(delta, res^2/gap,
    lowerGap)`` when the Ritz value is separated (``gap > res``), else
    ``min(res, lowerGap)``; clamped to not cross the previous (already
    better converged) value. ``gap``/``lowerGap`` come from the merged
    sorted list (locked ++ window) and ``delta`` from the previous
    iteration's values at the same sorted position.

    Interior targets: while the Ritz value is within ``res`` of the user
    shift it is untrusted — use the target shift itself; with refined
    extraction the Ritz value is trusted immediately; otherwise take the
    closest point of ``[lambda - res, lambda + res]`` to the target.

    Returns ``(sigma, prev_ritz', num_prev_ritz')``.
    """
    lam0 = jnp.where(valid, jnp.where(jnp.isfinite(lam), lam, 0), 0)
    if not cfg.hermitian:
        return lam0, s.prev_ritz, s.num_prev_ritz

    c = cfg.cwin
    rdt = s.prev_ritz.dtype
    big = jnp.asarray(jnp.finfo(rdt).max / 8, rdt)
    tiny = jnp.finfo(rdt).tiny
    hl = win.sol.hvals[:c].astype(rdt)
    act = win.live
    hv = jnp.where(act, jnp.where(jnp.isfinite(hl), hl, 0), big)
    n_act = _i32(jnp.sum(act.astype(jnp.int32)))

    # persist the current merged-sorted values at absolute positions
    prev2 = _dus(s.prev_ritz[None, :], hv[None, :], 0,
                 s.num_locked)[0]
    nprev2 = _i32(s.num_locked + n_act)

    if cfg.target in (Target.smallest, Target.largest):
        if not cfg.robust_shifts:
            return lam0, prev2, nprev2
        j = cand_idx
        si = s.num_locked + j
        lastlock = s.locked_vals[jnp.maximum(s.num_locked - 1, 0)].astype(
            rdt)
        has_lower = (j > 0) | (s.num_locked > 0)
        lower_val = jnp.where(j > 0, hv[jnp.maximum(j - 1, 0)], lastlock)
        up_ok = (j + 1 < c) & act[jnp.minimum(j + 1, c - 1)]
        upper_val = hv[jnp.minimum(j + 1, c - 1)]
        resr = res.astype(rdt)
        lam_r = lam0.astype(rdt)
        lower_gap = jnp.where(has_lower, jnp.abs(lam_r - lower_val), big)
        upper_gap = jnp.where(up_ok, jnp.abs(upper_val - lam_r), big)
        gap = jnp.minimum(lower_gap, upper_gap)
        prev = s.prev_ritz[jnp.clip(si, 0, s.prev_ritz.shape[0] - 1)]
        delta = jnp.where(si < s.num_prev_ritz,
                          jnp.abs(prev - lam_r), big)
        eps_sep = jnp.minimum(delta, jnp.minimum(
            resr * resr / jnp.maximum(gap, tiny), lower_gap))
        eps_clu = jnp.minimum(resr, lower_gap)
        epsilon = jnp.where(gap > resr, eps_sep, eps_clu)
        epsilon = jnp.where(s.stats.num_outer_iterations <= 1, resr,
                            epsilon)
        if cfg.target == Target.smallest:
            sig = lam_r - epsilon
            sig = jnp.where(has_lower, jnp.maximum(sig, lower_val), sig)
        else:
            sig = lam_r + epsilon
            sig = jnp.where(has_lower, jnp.minimum(sig, lower_val), sig)
        sigma = jnp.where(valid, sig, 0).astype(lam0.dtype)
        return sigma, prev2, nprev2

    # interior targets (correction.c:203-239)
    ts = shifts[jnp.minimum(s.num_locked, shifts.shape[0] - 1)].astype(
        lam0.dtype)
    d = ts - lam0
    near = jnp.abs(d) < res.astype(lam0.dtype)
    if cfg.projection == Projection.refined:
        far = lam0
    else:
        far = lam0 + res.astype(lam0.dtype) * jnp.sign(d)
    sigma = jnp.where(valid, jnp.where(near, ts, far), 0)
    return sigma, prev2, nprev2


# ---------------------------------------------------------------------------
# Restart (restart_Sprimme, src/eigs/restart.c:200)
# ---------------------------------------------------------------------------

def _ortho_span_coeff(P, C, tol):
    """Orthonormalize the columns of small coefficient block ``P`` against
    orthonormal ``C`` and internally (eigh-based, rank-revealing). Returns
    (Q [m, k], valid [k]) where invalid columns are zero. This is
    ``ortho_coefficient_vectors`` (``src/eigs/restart.c:2330``) in
    coefficient space."""
    P = P - bcomb(C, gram(C, P))
    P = P - bcomb(C, gram(C, P))  # second CGS pass
    G = gram(P, P)
    w, U = jnp.linalg.eigh(G)     # ascending
    wmax = jnp.maximum(jnp.max(w), jnp.asarray(1.0, w.dtype))
    valid = w > tol * wmax
    inv = jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, w, 1.0)), 0.0)
    Q = bcomb(P, U * inv[None, :].astype(P.dtype))
    return Q, valid


def do_restart(cfg: SolveConfig, A, B, s: SolverState, win: Window,
               has_B: bool) -> SolverState:
    """Thick restart with +k retention and (optional) hard locking."""
    mmax, mrs, kmax, c = cfg.mmax, cfg.mrs, cfg.kmax, cfg.cwin
    idx = jnp.arange(mmax, dtype=jnp.int32)
    active = win.sol.active
    rdt = s.locked_res.dtype    # compute-precision reals (f32 for bf16)

    # --- hard locking: move converged targets into evecs -----------------
    if cfg.locking:
        # Lock at most the first ne pairs: verification-probe extras
        # converge beyond ne and stay (converged) in the window — evecs
        # capacity is sized for ne locked pairs + the window, and a probe
        # pair that displaces is still returned through the merged
        # target-sorted extraction.
        cap = jnp.clip(jnp.asarray(cfg.ne, jnp.int32)
                       - s.num_locked.astype(jnp.int32), 0, c)
        lock = win.conv & (jnp.cumsum(win.conv.astype(jnp.int32)) <= cap)
        lockorder = jnp.argsort(jnp.arange(c, dtype=jnp.int32)
                                + _BIG * (~lock).astype(jnp.int32))
        nl = _i32(jnp.sum(lock.astype(jnp.int32)))
        lvalid = (jnp.arange(c) < nl)
        lv = lvalid.astype(s.V.dtype)[None, :]
        Xl = win.cands.X[:, lockorder] * lv
        BXl = (win.cands.BX[:, lockorder] * lv if has_B else Xl)
        laml = jnp.where(lvalid, win.sol.hvals[:c][lockorder], 0)
        resl = jnp.where(lvalid, win.cands.resnorms[lockorder], 0)
        laml = laml.astype(s.locked_vals.dtype)
        off = cfg.noc + s.num_locked
        evecs = _dus(s.evecs,
                     jnp.where(lvalid[None, :], Xl,
                               _ds(s.evecs, 0, off, (cfg.n, c))
                               ).astype(s.evecs.dtype), 0, off)
        Bevecs = (_dus(s.Bevecs,
                       jnp.where(lvalid[None, :], BXl,
                                 _ds(s.Bevecs, 0, off, (cfg.n, c))
                                 ).astype(s.Bevecs.dtype), 0, off)
                  if has_B else s.Bevecs)
        locked_vals = jax.lax.dynamic_update_slice(
            s.locked_vals, jnp.where(
                lvalid, laml,
                jax.lax.dynamic_slice(s.locked_vals, (_i32(s.num_locked),),
                                      (c,))), (_i32(s.num_locked),))
        locked_res = jax.lax.dynamic_update_slice(
            s.locked_res, jnp.where(
                lvalid, resl.astype(rdt),
                jax.lax.dynamic_slice(s.locked_res, (_i32(s.num_locked),),
                                      (c,))), (_i32(s.num_locked),))
        num_locked = _i32(s.num_locked + nl)
        locked_now = jnp.zeros((mmax,), jnp.bool_).at[:c].set(lock)
    else:
        nl = jnp.zeros((), jnp.int32)
        evecs, Bevecs = s.evecs, s.Bevecs
        locked_vals, locked_res = s.locked_vals, s.locked_res
        num_locked = s.num_locked
        locked_now = jnp.zeros((mmax,), jnp.bool_)

    # --- keep the converged pairs + the best unconverged ones ------------
    # Soft locking MUST retain every converged (non-locked) pair through
    # the restart — with minRestartSize < numConverged, truncating to mrs
    # drops a converged pair which then has to re-converge, and the
    # iteration can cycle forever re-deriving the same pairs
    # (restart_soft_locking keeps converged Ritz vectors,
    # src/eigs/restart.c:598-680). Priority: converged first (in sorted
    # order), then best unconverged, up to max(mrs, numConverged) columns.
    conv_full = jnp.zeros((mmax,), jnp.bool_).at[:c].set(win.conv)
    conv_keep = conv_full & ~locked_now & active
    keepW = min(max(mrs, cfg.cwin), mmax - max(kmax, 0))
    keep_key = idx + _BIG * (~conv_keep).astype(jnp.int32) \
        + 2 * _BIG * locked_now.astype(jnp.int32) \
        + 4 * _BIG * (~active).astype(jnp.int32)
    keep_order = jnp.argsort(keep_key)[:keepW]
    nkeep = jnp.clip(jnp.maximum(jnp.asarray(mrs, jnp.int32),
                                 _i32(jnp.sum(conv_keep.astype(jnp.int32)))),
                     0, keepW)
    keep_ok = (active[keep_order] & ~locked_now[keep_order]
               & (jnp.arange(keepW, dtype=jnp.int32) < nkeep))
    Ckeep = win.sol.hvecs[:, keep_order] * keep_ok.astype(s.H.dtype)[None, :]
    if cfg.projection != Projection.RR:
        # refined/harmonic coefficient vectors are not mutually orthogonal;
        # restart requires an orthonormal C (restart_refined/harmonic,
        # src/eigs/restart.c:1837,2255).
        Ckeep, keep_ok = orthonormalize_coeffs(
            Ckeep, keep_ok, machine_eps(s.H.dtype))

    # --- +k: retain previous-iteration coefficient vectors ---------------
    if kmax > 0:
        meps = machine_eps(s.H.dtype)
        # Retained vectors must be orthogonal to BOTH the kept and the
        # just-locked coefficient vectors — a retained vector is typically
        # within O(res) of the pair that just converged, and projecting
        # only against the kept set would re-insert the locked eigenvector
        # into the basis, which then re-converges as a spurious duplicate
        # (the reference orthogonalizes against the full outgoing basis,
        # ``ortho_coefficient_vectors``, ``src/eigs/restart.c:2330``).
        if cfg.locking:
            Clock = win.sol.hvecs * locked_now.astype(s.H.dtype)[None, :]
            Cavoid = jnp.concatenate([Ckeep, Clock], axis=1)
        else:
            Cavoid = Ckeep
        Pq, pvalid = _ortho_span_coeff(s.prev_hvecs.astype(s.H.dtype),
                                       Cavoid, 64.0 * meps)
        C = jnp.concatenate([Ckeep, Pq], axis=1)
        colvalid = jnp.concatenate([keep_ok, pvalid], axis=0)
    else:
        C = Ckeep
        colvalid = keep_ok

    # compact valid columns to the front, pad to mmax
    order3 = jnp.argsort(jnp.arange(colvalid.shape[0], dtype=jnp.int32)
                         + _BIG * (~colvalid).astype(jnp.int32))
    C = C[:, order3]
    b_new = _i32(jnp.sum(colvalid.astype(jnp.int32)))
    Cfull = jnp.zeros((mmax, mmax), s.H.dtype)
    Cfull = Cfull.at[:, :C.shape[1]].set(C)

    # --- apply in coefficient space (pt_dense: the restart half of the
    # reference's Num_update_VWXR / timeDense accounting) ------------------
    with jax.named_scope("pt_dense"):
        V = bcomb(s.V, Cfull).astype(s.V.dtype)
        W = bcomb(s.W, Cfull).astype(s.W.dtype)
        BV = bcomb(s.BV, Cfull).astype(s.BV.dtype) if has_B else s.BV
        H = gram(Cfull, jnp.matmul(s.H, Cfull,
                                   precision=jax.lax.Precision.HIGHEST))
    if cfg.hermitian:
        H = 0.5 * (H + _herm(H))

    # Accumulated-roundoff accounting (restart.c:425-440): after R
    # restarts the basis orthonormality / residual consistency has eroded
    # by ~sqrt(R)*macheps*||A||; raise the reachable-accuracy floor and
    # the residual-error estimate accordingly. Locking also raises the
    # floor to the residuals actually achieved by locked pairs
    # (restart.c:616-629).
    meps_r = machine_eps(s.V.dtype)
    rsr = s.restarts_since_reset + 1
    nres = s.stats.num_restarts + 1
    anorm_r = jnp.maximum(s.stats.anorm_estimate, 1e-30)
    drift = jnp.sqrt(nres.astype(anorm_r.dtype)) * meps_r * anorm_r
    if cfg.b_norm > 0:
        # deltaEig (auxiliary_eigs.c:625-640): for generalized problems the
        # resolvable-eigenvalue floor scales as problemNorm/sqrt(|B|)*eps
        drift = drift / jnp.sqrt(jnp.asarray(cfg.b_norm, drift.dtype))
    mct = jnp.maximum(s.stats.max_conv_tol, drift)
    if cfg.locking:
        mct = jnp.maximum(mct, jnp.max(jnp.where(
            jnp.arange(locked_res.shape[0]) < num_locked, locked_res, 0)))
    stats = s.stats._replace(
        num_restarts=_i32(s.stats.num_restarts + 1),
        num_locked=_i32(s.stats.num_locked + nl),
        max_conv_tol=mct, estimate_resid_error=drift)
    # Locking progress resets the stagnation tracking: best_res is the
    # best residual of the *current* leading candidate, which changes
    # identity when a pair locks; the reset budget is per-target too.
    rinf = jnp.asarray(jnp.finfo(rdt).max, rdt)
    s = s._replace(V=V, W=W, BV=BV, H=H, b=b_new,
                   prev_hvecs=jnp.zeros_like(s.prev_hvecs),
                   evecs=evecs, Bevecs=Bevecs, locked_vals=locked_vals,
                   locked_res=locked_res, num_locked=num_locked,
                   best_res=jnp.where(nl > 0, rinf, s.best_res),
                   restarts_since_reset=_i32(rsr),
                   stall_restarts=jnp.where(nl > 0, 0,
                                            s.stall_restarts).astype(jnp.int32),
                   stats=stats._replace(num_resets=_i32(jnp.where(
                       nl > 0, 0, stats.num_resets))))
    # If locking consumed the whole basis (all active pairs converged and
    # were locked, nothing kept), refill with a random block so the
    # iteration can continue — the reference inserts initial guesses /
    # random vectors at this point (restart.c:269-276, main_iter random
    # substitution). Without this, b = 0 is an absorbing state.
    return jax.lax.cond(s.b < 1, lambda s: _refill_random(cfg, A, B, s),
                        lambda s: s, s)


def _refill_random(cfg: SolveConfig, A, B, s: SolverState) -> SolverState:
    key, kk, kr = jax.random.split(s.key, 3)
    X = _rand_block(kr, cfg.n, cfg.blk, la.compute_dtype(s.V.dtype))
    locked = ((s.evecs, s.Bevecs if B is not None else s.evecs)
              if (cfg.noc > 0 or cfg.locking) else None)
    res = block_ortho(X, (s.V, s.BV if B is not None else s.V), locked,
                      _i32(cfg.blk), kk, Bop=B,
                      locked_count=_i32(cfg.noc + s.num_locked))
    V = _dus(s.V, res.X.astype(s.V.dtype), 0, 0)
    BV = (_dus(s.BV, res.BX.astype(s.BV.dtype), 0, 0)
          if B is not None else s.BV)
    Y = _mv(A, res.X)
    W = _dus(s.W, Y.astype(s.W.dtype), 0, 0)
    H = gram(V, Y)
    Hn = jnp.zeros_like(s.H)
    Hn = _dus(Hn, H, 0, 0)
    if cfg.hermitian:
        Hn = 0.5 * (Hn + _herm(Hn))
    stats = s.stats._replace(
        num_matvecs=_i32(s.stats.num_matvecs + cfg.blk))
    return s._replace(V=V, W=W, BV=BV, H=Hn, b=_i32(cfg.blk),
                      key=key, stats=stats)


# ---------------------------------------------------------------------------
# Expansion (one outer iteration of main_iter.c:517)
# ---------------------------------------------------------------------------

def do_expand(cfg: SolveConfig, A, B, K, s: SolverState, win: Window,
              shifts=None, inner_solve=None,
              force_random=None) -> SolverState:
    """One expansion step. ``force_random`` (traced bool or None): replace
    the correction directions with a fresh random block — used to start a
    verification probe round (components of unseen invariant directions;
    corrections alone preserve the complement of span(V) for Hermitian A)
    and to un-starve a basis with no unconverged candidates left."""
    blk, c, mmax, kmax = cfg.blk, cfg.cwin, cfg.mmax, cfg.kmax
    order = _unconverged_order(win)
    n_unconv = _i32(jnp.sum((~win.conv & win.live
                             & win.is_target).astype(jnp.int32)))
    nc = _i32(jnp.minimum(blk, n_unconv))
    if force_random is not None:
        nc = _i32(jnp.where(force_random, blk, nc))
    cand_idx = order[:blk]
    valid = jnp.arange(blk) < nc
    vmask = valid.astype(win.cands.X.dtype)[None, :]

    # column selection as a one-hot matmul: a gather on an [n, cwin]
    # operand runs on the slow path, while the MXU streams the array at
    # full HBM bandwidth (measured ~57us vs ~12us per selection at n=262k)
    sel = (jax.nn.one_hot(cand_idx, c, dtype=real_dtype(win.cands.X.dtype))
           .T.astype(win.cands.X.dtype)) * vmask
    R = bcomb(win.cands.R, sel)
    X = bcomb(win.cands.X, sel)
    BX = bcomb(win.cands.BX, sel) if B is not None else X
    lam = win.sol.hvals[:c][cand_idx]
    res = win.cands.resnorms[cand_idx]
    if shifts is None:
        shifts = jnp.zeros((1,), s.prev_ritz.dtype)
    sigma, prev_ritz2, num_prev2 = _robust_shifts(
        cfg, s, win, cand_idx, lam, res, valid, shifts)

    # +k retention candidates for the *next* restart (unconverged-first)
    if kmax > 0:
        pidx = order[:kmax]
        pvalid = (jnp.arange(kmax) < jnp.minimum(
            kmax, _i32(jnp.sum(win.live.astype(jnp.int32)))))
        prev = win.sol.hvecs[:, :c][:, pidx] * pvalid.astype(s.H.dtype)[None, :]
    else:
        prev = s.prev_hvecs

    trace0 = jnp.zeros_like(s.inner_trace)

    def _corrections(kr):
        n_inner = jnp.zeros((), jnp.int32)
        n_prec = jnp.zeros((), jnp.int32)
        n_mv_inner = jnp.zeros((), jnp.int32)
        trace = trace0
        if cfg.max_inner != 0 and inner_solve is not None:
            out = inner_solve(
                cfg, A, B, K, s, X, BX, R, sigma, res, valid, win.tol,
                evals=lam)
            if len(out) == 5:     # built-in solver with tracing enabled
                D, n_inner, n_mv_inner, n_prec, trace = out
                trace = trace.astype(trace0.dtype)
            else:
                D, n_inner, n_mv_inner, n_prec = out
        else:
            D = gd_correction(cfg, K, R, X, sigma, valid)
            if K is not None:
                n_prec = nc.astype(jnp.int32)
        return D, _i32(n_inner), _i32(n_mv_inner), _i32(n_prec), trace

    key, kk, kr = jax.random.split(s.key, 3)
    if force_random is None:
        D, n_inner, n_mv_inner, n_prec, itrace = _corrections(kr)
    else:
        z = jnp.zeros((), jnp.int32)
        D, n_inner, n_mv_inner, n_prec, itrace = jax.lax.cond(
            force_random,
            lambda kr: (_rand_block(kr, cfg.n, blk, R.dtype), z, z, z,
                        trace0),
            _corrections, kr)
    locked = ((s.evecs, s.Bevecs if B is not None else s.evecs)
              if (cfg.noc > 0 or cfg.locking) else None)
    ores = block_ortho(D, (s.V, s.BV if B is not None else s.V), locked,
                       nc, kk, Bop=B,
                       locked_count=_i32(cfg.noc + s.num_locked))
    # A direction (and its random replacement) can collapse to zero when
    # span(V) + locked already exhausts the space; such columns are zeroed
    # by block_ortho's second pass and MUST NOT be counted as basis
    # columns (a zero active column shows up as a fake converged pair with
    # eigenvalue 0). Compact surviving columns to the front.
    def _survivors(o):
        cn2 = jnp.real(jnp.sum(o.X.conj() * o.X, axis=0))
        # ~(cn2 >= 0.25) also penalizes NaN columns (a singular Cholesky
        # inside block_ortho at span exhaustion) in the ordering
        srt = jnp.argsort(jnp.arange(blk, dtype=jnp.int32)
                          + _BIG * (~(cn2 >= 0.25)).astype(jnp.int32))
        srv = _i32(jnp.sum((cn2 >= 0.25).astype(jnp.int32)))
        Xc = o.X[:, srt]
        BXc = o.BX[:, srt] if B is not None else Xc
        return o._replace(X=Xc, BX=BXc), srv

    ores, srv = _survivors(ores)

    # All correction directions collapsed (rare: near-exhausted span or a
    # degenerate preconditioner). Retry with a fresh random block; if even
    # that collapses, nc=0 and the zero-progress guard below restarts.
    def _retry_random(args):
        o, key = args
        key, k1, k2 = jax.random.split(key, 3)
        rnd = _rand_block(k1, cfg.n, blk, s.V.dtype)
        o2 = block_ortho(rnd, (s.V, s.BV if B is not None else s.V),
                         locked, nc, k2, Bop=B,
                         locked_count=_i32(cfg.noc + s.num_locked))
        o2, srv2 = _survivors(o2)
        return o2, srv2, key

    ores, srv, key = jax.lax.cond(
        (srv == 0) & (nc > 0),
        _retry_random,
        lambda args: (args[0], srv, args[1]),
        (ores, key))
    nc = jnp.minimum(nc, srv)
    # where(), not multiply: NaN * 0 is still NaN and all blk columns
    # are written into the basis below
    keepf = (jnp.arange(blk) < nc)[None, :]
    oX = jnp.where(keepf, ores.X, 0)
    oBX = jnp.where(keepf, ores.BX, 0) if B is not None else oX
    ores = ores._replace(X=oX, BX=oBX)

    V = _dus(s.V, ores.X.astype(s.V.dtype), 0, s.b)
    BV = (_dus(s.BV, ores.BX.astype(s.BV.dtype), 0, s.b)
          if B is not None else s.BV)
    Y = _mv(A, ores.X)
    W = _dus(s.W, Y.astype(s.W.dtype), 0, s.b)
    hc = gram(V, Y)                      # [mmax, blk] new columns of H
    H = _dus(s.H, hc, 0, s.b)
    if cfg.hermitian:
        H = _dus(H, _herm(hc), s.b, 0)
    else:
        # non-Hermitian H: the new ROW panel is (new basis block)^H W,
        # not the conjugate of the column panel
        hr = gram(ores.X, W)             # [blk, mmax]
        H = _dus(H, hr, s.b, 0)
    # comm/inner-product accounting: one block_ortho + the H panel
    # gram(s) + ~5 width-blk dot products per inner QMR iteration
    ngs_bo, vol_bo = _ortho_counts(cfg, locked is not None)
    npanel = 1 if cfg.hermitian else 2
    sdt = s.stats.volume_global_sum.dtype
    innerf = n_inner.astype(sdt)
    stats = s.stats._replace(
        num_outer_iterations=_i32(s.stats.num_outer_iterations + 1),
        num_matvecs=_i32(s.stats.num_matvecs + nc + n_mv_inner),
        num_preconds=_i32(s.stats.num_preconds + n_prec),
        num_inner_iterations=_i32(s.stats.num_inner_iterations + n_inner),
        num_random=_i32(s.stats.num_random + ores.n_random),
        num_global_sum=_i32(s.stats.num_global_sum + ngs_bo + npanel
                            + 5 * n_inner),
        volume_global_sum=(s.stats.volume_global_sum + vol_bo
                           + float(npanel * cfg.mmax * blk)
                           + 5.0 * blk * innerf),
        num_ortho_inner_prods=s.stats.num_ortho_inner_prods + vol_bo)
    return s._replace(V=V, W=W, BV=BV, H=H, b=_i32(s.b + nc),
                      prev_hvecs=prev, key=key, stats=stats,
                      prev_ritz=prev_ritz2, num_prev_ritz=num_prev2,
                      inner_trace=itrace)



# ---------------------------------------------------------------------------
# Reset (main_iter.c:853-896): rebuild W = A V and re-orthonormalize V when
# accumulated restart roundoff poisons the residuals, or the iteration
# stagnates. Costs one full-basis matvec + ortho — negligible next to the
# stall it cures.
# ---------------------------------------------------------------------------

def do_reset(cfg: SolveConfig, A, B, s: SolverState) -> SolverState:
    amaskf = col_mask(cfg.mmax, s.b, s.V.dtype)[None, :]
    V = s.V * amaskf
    # two CGS passes against the locked vectors, then rank-revealing
    # symmetric whitening. A one-shot CholeskyQR cannot be used here:
    # with no intra-block projection, a linearly dependent unit-norm
    # column passes the diagonal (Daniel's) test but makes the Gram
    # non-PD, so eigh-based whitening both orthonormalizes and drops
    # the null directions (the reference's ortho re-runs with random
    # replacement in the same situation, src/eigs/ortho.c:124).
    if cfg.locking or cfg.noc > 0:
        for _ in range(2):
            V = la.prefix_project(s.evecs,
                                  s.Bevecs if B is not None else s.evecs,
                                  V, _i32(cfg.noc + s.num_locked))
    Bv = _mv(B, V) if B is not None else V
    G = gram(V, Bv)
    G = 0.5 * (G + _herm(G))
    meps = machine_eps(s.V.dtype)
    lam, U = jnp.linalg.eigh(G)                      # ascending
    lam = lam[::-1]                                  # descending: good first
    U = U[:, ::-1]
    lmax = jnp.maximum(jnp.real(lam[0]), meps)
    good = (jnp.real(lam) > 64.0 * meps * lmax) & jnp.isfinite(jnp.real(lam))
    scale = jnp.where(good, jax.lax.rsqrt(jnp.maximum(
        jnp.real(lam), meps)), 0.0).astype(G.dtype)
    C = U * scale[None, :]
    V = la.bcomb(V, C).astype(s.V.dtype)
    BV = la.bcomb(Bv, C).astype(s.BV.dtype) if B is not None else s.BV
    W = _mv(A, V).astype(s.W.dtype)
    H = gram(V, W)
    if cfg.hermitian:
        H = 0.5 * (H + _herm(H))
    nkeep = _i32(jnp.sum(good.astype(jnp.int32)))
    has_locked = cfg.locking or cfg.noc > 0
    stats = s.stats._replace(
        # nkeep, not s.b: whitening zeroes the rank-deficient columns,
        # so only the surviving basis columns carry real A-applications
        num_matvecs=_i32(s.stats.num_matvecs + nkeep),
        num_resets=_i32(s.stats.num_resets + 1),
        estimate_resid_error=jnp.zeros_like(s.stats.estimate_resid_error),
        num_global_sum=_i32(s.stats.num_global_sum + 2
                            + (2 if has_locked else 0)),
        volume_global_sum=(s.stats.volume_global_sum
                           + 2.0 * cfg.mmax * cfg.mmax
                           + (2.0 * cfg.lockmax * cfg.mmax
                              if has_locked else 0.0)),
        num_ortho_inner_prods=(s.stats.num_ortho_inner_prods
                               + float(cfg.mmax * cfg.mmax)))
    return s._replace(V=V, W=W, BV=BV, H=H, b=nkeep,
                      prev_hvecs=jnp.zeros_like(s.prev_hvecs),
                      best_res=jnp.asarray(jnp.finfo(
                          s.best_res.dtype).max, s.best_res.dtype),
                      restarts_since_reset=jnp.zeros((), jnp.int32),
                      stall_restarts=jnp.zeros((), jnp.int32), stats=stats)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _shift_array(p: PrimmeParams, rdt) -> jax.Array:
    ts = p.target_shifts if p.target_shifts else (0.0,)
    return jnp.asarray(ts, rdt)


def setup_solver(A, p: PrimmeParams, *, B=None, v0=None,
                 ortho_const=None, key=None, dtype=None, shard=None,
                 inner_trace_cap: int = 0):
    """Build config + initial state (``wrapper_Sprimme`` setup portion,
    ``src/eigs/primme_c.c:278``)."""
    cfg = make_config(p)
    if inner_trace_cap:
        cfg = cfg._replace(inner_trace_cap=int(inner_trace_cap))
    dtype = jnp.dtype(dtype or A.dtype)   # basis STORAGE dtype
    if not p.hermitian and not jnp.issubdtype(dtype, jnp.complexfloating):
        # KIND(N) solves carry complex Ritz values/vectors: a real basis
        # dtype would make the correction block (complex, from
        # solve_H_normal's hvecs) and the basis disagree inside lax.cond
        # branches (trace-time TypeError). Promote storage to the
        # matching complex dtype — api.eigs does this coercion at its
        # boundary; the core entry point must be safe too.
        dtype = jnp.promote_types(dtype, jnp.complex64)
    cdt = la.compute_dtype(dtype)         # small-dense / accumulation dtype
    rdt = real_dtype(cdt)
    if cdt != dtype:
        # Half-precision basis (bf16/f16): generalized projected solve
        # against the explicit V^H B V (orth=explicit_I,
        # src/eigs/primme_c.c:304-319) and an eps floor at the storage
        # resolution. Only the RR projection supports this.
        if cfg.projection != Projection.RR:
            raise ValueError(
                f"projection={cfg.projection} requires f32+ working "
                "precision; half-precision basis supports RR only")
        cfg = cfg._replace(orth_explicit_I=True,
                           eps_floor=4.0 * machine_eps(dtype))
    if key is None:
        # raw uint32 key: a TYPED key array carried through lax.while_loop
        # crashes the TPU compiler under jax_enable_x64 (measured:
        # "Invalid index {0} for shape u32[2]" in shape_util); the legacy
        # raw-key representation lowers cleanly and is semantically
        # identical for split/normal/fold_in
        key = jax.random.PRNGKey(p.rng_seed)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    shifts = _shift_array(p, rdt)
    s0 = _build_state_jit(cfg, A, B, v0, ortho_const, key, dtype, shard)
    return cfg, shifts, s0


def _build_state(cfg: SolveConfig, A, B, v0, ortho_const, key, dtype,
                 shard) -> SolverState:
    """Array-building half of :func:`setup_solver` (jittable; ``cfg``,
    ``dtype`` and ``shard`` static)."""
    n, mmax = cfg.n, cfg.mmax
    cdt = la.compute_dtype(dtype)
    rdt = real_dtype(cdt)

    evecs0 = jnp.zeros((n, cfg.lockmax), dtype)
    if ortho_const is not None:
        noc = ortho_const.shape[1]
        assert noc == cfg.noc, (noc, cfg.noc)
        evecs0 = evecs0.at[:, :noc].set(ortho_const.astype(dtype))
    if B is None:
        # zero-width placeholder (see init_basis): never a duplicate leaf
        Bevecs0 = jnp.zeros((n, 0), dtype)
    else:
        Bevecs0 = (evecs0.at[:, :cfg.noc].set(
            B.matmat(evecs0[:, :cfg.noc])) if cfg.noc > 0 else evecs0)

    if shard is not None:
        # Row-shard the big arrays over the mesh (SURVEY §2.6: the
        # reference's 1-D nLocal row partition). The small projected state
        # stays replicated; XLA inserts psum for every Gram product — the
        # reference's globalSum callback (src/eigs/auxiliary_eigs.c:391).
        evecs0 = jax.lax.with_sharding_constraint(evecs0, shard)
        if B is not None:
            Bevecs0 = jax.lax.with_sharding_constraint(Bevecs0, shard)

    V, W, BV, H, b, key, nmv0, nrand0 = init_basis(
        A, B, cfg, key, evecs0, Bevecs0, v0, dtype)
    if shard is not None:
        V = jax.lax.with_sharding_constraint(V, shard)
        W = jax.lax.with_sharding_constraint(W, shard)
        if B is not None:
            BV = jax.lax.with_sharding_constraint(BV, shard)

    b0 = max(min(cfg.mrs, mmax), min(cfg.blk, mmax))
    nb0 = -(-b0 // cfg.blk)
    ngs_bo, vol_bo = _ortho_counts(cfg, cfg.noc > 0)
    stats = Stats.zeros(rdt)._replace(
        num_matvecs=nmv0, num_random=nrand0.astype(jnp.int32),
        num_global_sum=jnp.asarray(nb0 * ngs_bo + 1, jnp.int32),
        volume_global_sum=jnp.asarray(nb0 * vol_bo + mmax * mmax, rdt),
        num_ortho_inner_prods=jnp.asarray(nb0 * vol_bo, rdt),
        probe_unsupported=jnp.asarray(cfg.probe_unsupported, jnp.int32))
    s0 = SolverState(
        V=V, W=W, BV=BV, H=H, b=b,
        prev_hvecs=jnp.zeros((mmax, max(cfg.kmax, 1)), cdt),
        evecs=evecs0, Bevecs=Bevecs0,
        locked_vals=jnp.zeros((cfg.lockmax - cfg.noc,),
                              rdt if cfg.hermitian else cdt),
        locked_res=jnp.zeros((cfg.lockmax - cfg.noc,), rdt),
        num_locked=jnp.zeros((), jnp.int32),
        best_res=jnp.asarray(jnp.finfo(rdt).max, rdt),
        restarts_since_reset=jnp.zeros((), jnp.int32),
        stall_restarts=jnp.zeros((), jnp.int32),
        prev_ritz=jnp.zeros((cfg.lockmax + cfg.cwin,), rdt),
        num_prev_ritz=jnp.zeros((), jnp.int32),
        probe_ref=jnp.asarray(jnp.finfo(rdt).max, rdt),
        probe_clean=jnp.zeros((), jnp.int32),
        probe_bnd_hi=jnp.zeros((), rdt),
        probe_bnd_lo=jnp.zeros((), rdt),
        probe_bnds_set=jnp.zeros((), jnp.bool_),
        verified=jnp.asarray(cfg.probe_extra == 0, jnp.bool_),
        inner_trace=jnp.zeros(
            (cfg.inner_trace_cap, cfg.blk, 3) if cfg.inner_trace_cap > 0
            else (1, 1, 3), rdt),
        give_up=jnp.zeros((), jnp.bool_), key=key,
        done=jnp.zeros((), jnp.bool_), stats=stats)
    return s0


# state building is jitted (static cfg/dtype/shard) so host-driven
# segmented solves don't pay per-op eager dispatch; inside a user jit the
# nested call simply inlines.
_build_state_jit = jax.jit(_build_state, static_argnums=(0, 6, 7))


def run_segment(cfg: SolveConfig, A, B, K, inner_solve, shifts,
                s: SolverState, seg_end, debug=False,
                monitor=None, convtest=None) -> SolverState:
    """Run the main iteration until done, limits, or
    ``num_outer_iterations >= seg_end`` (``main_iter_Sprimme``,
    ``src/eigs/main_iter.c:176``). Segmentation serves the dynamic
    method-switching driver, which times segments on the host."""
    mmax = cfg.mmax

    def cond(s: SolverState):
        return (~s.done & ~s.give_up
                & (s.stats.num_outer_iterations < cfg.max_outer)
                & (s.stats.num_outer_iterations < seg_end)
                & (s.stats.num_matvecs < cfg.max_matvecs))

    def body(s: SolverState):
        ne_i = jnp.asarray(cfg.ne, jnp.int32)
        win, stats = prepare_window(cfg, s, shifts, B is not None,
                                    convtest=convtest)
        s = s._replace(stats=stats)
        c = cfg.cwin
        pos = jnp.arange(c, dtype=jnp.int32)
        locked = s.num_locked.astype(jnp.int32)
        n_base = jnp.clip(ne_i - locked, 0, c)
        nconv_base = _i32(jnp.sum((win.conv & (pos < n_base)
                                   ).astype(jnp.int32)))
        n_unconv = _i32(jnp.sum((~win.conv & win.live
                                 & win.is_target).astype(jnp.int32)))
        # the requested pairs all pass — pending spectrum verification.
        # The n_unconv term covers locking-phase intruders (window pairs
        # sorting inside the locked set, see prepare_window): they must
        # converge before the solve may finish.
        done_cand = ((locked + nconv_base) >= ne_i) & (n_unconv == 0)

        # --- spectrum verification (see SolverState docstring; no
        # reference analogue — verify_norms, src/eigs/main_iter.c:1864,
        # rechecks residuals but cannot detect a missed degenerate-cluster
        # member, the reference's own silent failure mode) ----------------
        b_pre = s.b
        if cfg.probe_extra > 0:
            margin = win.tol
            newkth = _kth_best_key(cfg, s, win, shifts)
            # a verified set that later improves (a late-surfacing member
            # converged after its probe round) must be re-verified
            reopen = s.verified & (newkth < s.probe_ref - margin)
            verified = s.verified & ~reopen
            clean = jnp.where(reopen, 0, s.probe_clean)
            rounds = s.stats.num_probe_rounds
            want = done_cand & ~verified
            cap_hit = want & (rounds >= cfg.max_probe_rounds)
            # the cap still latches `verified` so the loop can terminate,
            # but the exhaustion is RECORDED — the result is flagged
            # unverified-by-exhaustion, never silently "ok"
            verified = verified | cap_hit
            do_probe = (want & ~cap_hit
                        & (s.b + cfg.blk <= mmax)
                        & (s.stats.num_matvecs < cfg.max_matvecs))
            s = s._replace(verified=verified, probe_clean=clean,
                           stats=s.stats._replace(probe_exhausted=_i32(
                               jnp.where(cap_hit, 1,
                                         s.stats.probe_exhausted))))

            def run_probe(s):
                key, kp = jax.random.split(s.key)
                s = s._replace(key=key)
                pr = _probe_subsolve(cfg, A, B, K, s, win, shifts,
                                     newkth, margin, kp)
                stats = s.stats._replace(
                    num_matvecs=_i32(s.stats.num_matvecs + pr.num_matvecs),
                    num_probe_matvecs=_i32(s.stats.num_probe_matvecs
                                           + pr.num_matvecs),
                    num_preconds=_i32(s.stats.num_preconds
                                      + pr.num_preconds),
                    num_probe_rounds=_i32(s.stats.num_probe_rounds + 1))
                # two consecutive clean rounds (independent injections)
                # are required before the set counts as verified; a round
                # whose Chebyshev filter demonstrably failed (pr.valid
                # False — spectral bounds wrong) is INCONCLUSIVE: it
                # neither finds nor counts as clean, and repeated filter
                # failure surfaces as probe_exhausted at the round cap
                clean2 = jnp.where(pr.found, 0,
                                   jnp.where(pr.valid, s.probe_clean + 1,
                                             s.probe_clean))
                now_verified = (~pr.found) & pr.valid & (clean2 >= 2)
                # a genuinely clean verification supersedes an earlier
                # cap exhaustion (set reopened and then verified)
                stats = stats._replace(probe_exhausted=_i32(
                    jnp.where(now_verified, 0, stats.probe_exhausted)))
                if os.environ.get("PTPU_PROBE_DEBUG"):
                    jax.debug.print(
                        "probe round {r}: found={f} valid={v} clean={c} "
                        "mv={m} bar={bar}", r=stats.num_probe_rounds,
                        f=pr.found, v=pr.valid, c=clean2,
                        m=pr.num_matvecs, bar=newkth)
                s = s._replace(stats=stats, probe_clean=clean2,
                               probe_ref=newkth,
                               probe_bnd_hi=pr.bnd_hi,
                               probe_bnd_lo=pr.bnd_lo,
                               probe_bnds_set=pr.bnds_set,
                               verified=now_verified)
                return jax.lax.cond(
                    pr.found,
                    lambda s: _append_probe_block(cfg, A, B, s, pr.X),
                    lambda s: s, s)

            s = jax.lax.cond(do_probe, run_probe, lambda s: s, s)
        # a found-and-injected probe block is new basis content the stale
        # window knows nothing about: skip the action branch this
        # iteration (a restart built from the stale coefficient window
        # would wipe the injected columns)
        probe_injected = s.b > b_pre
        done = done_cand & s.verified

        # Stagnation detection: leading unconverged-candidate residual must
        # improve by 30% every few restarts, else reset the basis (the
        # reference triggers reset from its accumulated-error estimate,
        # main_iter.c:855-884; explicit stagnation tracking is the jit-
        # friendly equivalent).
        rinf_t = jnp.asarray(jnp.finfo(win.tol.dtype).max, win.tol.dtype)
        unconv_t = ~win.conv & win.is_target & win.live
        cur_res = jnp.min(jnp.where(unconv_t, win.cands.resnorms, rinf_t))
        # true stalls plateau bit-exactly (accumulated-roundoff floors),
        # while slow-but-healthy configs (e.g. maxBasisSize=3) still gain
        # fractions of a percent per restart — use a 0.1% bar
        improved = cur_res < 0.999 * s.best_res
        best_res = jnp.minimum(s.best_res, cur_res)
        stall = jnp.where(improved, 0, s.stall_restarts).astype(jnp.int32)
        full = s.b + cfg.blk > mmax
        need_reset = full & (stall >= 12)
        # stagnation bail-out: bounded reset cycles (monotone counter —
        # do_reset clears the stall counter, so stall alone cannot bound
        # the loop) and a cap on consecutive no-progress restarts. This is
        # a give-up, NOT success: it exits the loop with give_up set and
        # the extraction reports the honest current residuals.
        give_up = (s.stats.num_resets >= 30) | (stall >= 500)

        # Branch selection: a full basis restarts; a basis with no
        # unconverged candidates restarts if that can lock pairs out,
        # and is otherwise *starved* — only fresh random directions can
        # make progress (corrections preserve the orthogonal complement
        # of span(V) for Hermitian problems), so inject a random block.
        lockable = ((win.nconv > 0) & (locked < ne_i)) if cfg.locking \
            else jnp.zeros((), jnp.bool_)
        inject = (n_unconv == 0) & ~done & ~full & ~lockable
        need_restart = full | ((n_unconv == 0) & ~inject)

        def when_active(s):
            def restart_or_reset(s):
                s = do_restart(cfg, A, B, s, win, B is not None)
                s = s._replace(stall_restarts=_i32(s.stall_restarts + 1))
                return jax.lax.cond(need_reset,
                                    lambda s: do_reset(cfg, A, B, s),
                                    lambda s: s, s)

            def expand(s):
                mv0 = s.stats.num_matvecs
                s = do_expand(cfg, A, B, K, s, win, shifts=shifts,
                              inner_solve=inner_solve,
                              force_random=inject)
                # an expansion that added no basis column is a stall
                return s._replace(stall_restarts=_i32(jnp.where(
                    s.stats.num_matvecs > mv0, s.stall_restarts,
                    s.stall_restarts + 1)))

            return jax.lax.cond(need_restart, restart_or_reset, expand, s)

        if debug:
            cn = jnp.linalg.norm(s.V, axis=0)
            amask = jnp.arange(cfg.mmax) < s.b
            mincn = jnp.min(jnp.where(amask, cn, 1e9))
            vtq = jnp.max(jnp.abs(gram(s.evecs, s.V)))
            qn = jnp.linalg.norm(s.evecs, axis=0)
            qmask = jnp.arange(cfg.lockmax) < (cfg.noc + s.num_locked)
            minqn = jnp.min(jnp.where(qmask, qn, 1e9))
            xn = jnp.linalg.norm(win.cands.X, axis=0)
            minxn = jnp.min(jnp.where(win.conv, xn, 1e9))
            jax.debug.print(
                "it={it} b={b} lock={lk} nconv={nc} nunc={nu} "
                "res0={r0:.2e} hv0={h0:.3e} mincol={mc:.2e} VtQ={vq:.2e} "
                "minQ={mq:.2e} minconvX={mx:.2e}",
                it=s.stats.num_outer_iterations, b=s.b, lk=s.num_locked,
                nc=win.nconv, nu=n_unconv, r0=win.cands.resnorms[0],
                h0=win.sol.hvals[0], mc=mincn, vq=vtq, mq=minqn, mx=minxn)
        s = s._replace(best_res=best_res, stall_restarts=stall)
        s2 = jax.lax.cond(done | probe_injected, lambda s: s,
                          when_active, s)
        if monitor is not None:
            # Event stream (monitorFun, src/eigs/auxiliary_eigs_normal.c:
            # 446) with the reference's event taxonomy (primme_event,
            # include/primme_eigs.h:80-89): 0 outer_iteration,
            # 1 inner_iteration (aggregated per expansion here — the QMR
            # loop is one fused program), 2 restart, 3 reset,
            # 4 converged, 5 locked. One event per outer iteration, most
            # significant kind wins. Host callback; enabling it recompiles
            # the loop and adds a host sync per iteration.
            kshow = min(cfg.cwin, cfg.ne)
            inner_delta = (s2.stats.num_inner_iterations
                           - s.stats.num_inner_iterations)
            lock_delta = s2.num_locked - s.num_locked
            ev = jnp.where(
                need_reset, 3, jnp.where(
                    lock_delta > 0, 5, jnp.where(
                        need_restart & ~done, 2, jnp.where(
                            win.nconv > 0, 4, jnp.where(
                                inner_delta > 0, 1, 0)))))
            mon_kwargs = {}
            if cfg.inner_trace_cap > 0:
                # replay buffer for per-inner-iteration events
                # (primme_event_inner_iteration, inner_solve.c:491-500):
                # the host monitor re-emits one INN event per recorded
                # QMR iteration — same observability as the reference's
                # in-loop monitorFun call, one host sync per OUTER it.
                mon_kwargs["inner_trace"] = s2.inner_trace
            jax.debug.callback(
                monitor,
                event=ev,
                num_outer=s.stats.num_outer_iterations,
                num_matvecs=s2.stats.num_matvecs,
                num_locked=s2.num_locked,
                num_converged=win.nconv,
                basis_size=s2.b,
                num_inner=inner_delta,
                hvals=win.sol.hvals[:kshow],
                resnorms=win.cands.resnorms[:kshow],
                ordered=True,
                **mon_kwargs)
        return s2._replace(done=done, give_up=give_up)

    return jax.lax.while_loop(cond, body, s)


def extract_result(cfg: SolveConfig, s: SolverState, shifts,
                   has_B: bool) -> EigsResult:
    """Final extraction (``verify_norms``, ``src/eigs/main_iter.c:1864``,
    plus the merged return in ``main_iter.c:1343-1411``): pool the locked
    pairs and the basis-resident window pairs, order converged-first by
    target preference, return the best ``ne``.

    Residuals are always the honestly computed values — an exhausted
    budget or a stagnation give-up returns the best current pairs with
    their true (possibly above-tolerance) residuals, never placeholder
    slots. Slots with no pair at all (basis + locked smaller than ``ne``)
    return NaN eigenvalue / +inf residual."""
    win, stats = prepare_window(cfg, s, shifts, has_B)
    s = s._replace(stats=stats)
    ne, c = cfg.ne, cfg.cwin
    Lw = cfg.lockmax - cfg.noc
    rdt = real_dtype(s.H.dtype)   # compute precision (f32 for bf16 basis)
    big = jnp.asarray(jnp.finfo(rdt).max, rdt)
    vdt = rdt if cfg.hermitian else s.H.dtype
    sidx = jnp.minimum(s.num_locked, shifts.shape[0] - 1)

    lvalid = jnp.arange(Lw, dtype=jnp.int32) < s.num_locked
    lvals = jnp.where(lvalid, s.locked_vals, 0).astype(vdt)
    lres = jnp.where(lvalid, s.locked_res, big)
    lkeys = target_sort_keys(lvals, cfg.target, shifts, sidx).astype(rdt)

    act = win.live
    wvals = jnp.where(act & (jnp.abs(win.sol.hvals[:c]) < big),
                      win.sol.hvals[:c], 0).astype(vdt)
    wres = jnp.where(act, win.cands.resnorms, big)
    wkeys = target_sort_keys(wvals, cfg.target, shifts, sidx).astype(rdt)

    # converged pairs outrank unconverged ones whatever their key (an
    # unconverged Ritz mixture must not displace a converged pair from a
    # partial result); within each class, order by target preference.
    passing = jnp.concatenate([lvalid, win.passes])
    valid = jnp.concatenate([lvalid, act])
    keys = jnp.concatenate([lkeys, wkeys])
    keys = jnp.clip(keys, -big / 16, big / 16)
    keys = keys + jnp.where(passing, 0, big / 8) + jnp.where(valid, 0,
                                                             big / 4)
    order = jnp.argsort(keys)[:ne]

    from_locked = order < Lw
    lcol = jnp.clip(order, 0, Lw - 1)
    wcol = jnp.clip(order - Lw, 0, c - 1)
    out_vals = jnp.where(from_locked, lvals[lcol], wvals[wcol])
    out_res = jnp.where(from_locked, lres[lcol], wres[wcol])
    out_vecs = jnp.where(from_locked[None, :],
                         s.evecs[:, cfg.noc + lcol].astype(
                             win.cands.X.dtype),
                         win.cands.X[:, wcol])
    # slots with no pair: NaN eigenvalue, +inf residual (honest absence)
    missing = jnp.where(from_locked, ~lvalid[lcol], ~act[wcol])
    out_vals = jnp.where(missing, jnp.asarray(jnp.nan, vdt), out_vals)
    out_res = jnp.where(missing, jnp.asarray(jnp.inf, rdt), out_res)
    return EigsResult(evals=out_vals, evecs=out_vecs, resnorms=out_res,
                      stats=s.stats)


def solve_eigs(A, p: PrimmeParams, *, B=None, K=None, v0=None,
               ortho_const=None, key=None, inner_solve=None,
               dtype=None, debug=False, monitor=None,
               shard=None, convtest=None, segment_outer=None,
               inner_trace_cap: int = 0) -> EigsResult:
    """Run the eigensolver. All operators are
    :class:`~primme_tpu.operators.LinearOperator`; ``p`` must be resolved
    (via ``set_method``/``resolve_defaults``). Jittable end-to-end.

    ``segment_outer``: when set, the while loop is re-entered from the
    host every that-many outer iterations instead of running the whole
    solve as one device program. The solver state stays on device between
    segments (one scalar sync per segment); results are bit-identical.
    Use for very long solves — bounds single-program device time (some
    runtimes impose execution deadlines) and gives the host scheduler a
    heartbeat. Not jittable (host loop); incompatible with tracing.

    This is the analogue of ``wrapper_Sprimme`` + ``main_iter_Sprimme``
    (``src/eigs/primme_c.c:278``, ``src/eigs/main_iter.c:176``).
    """
    cfg, shifts, s0 = setup_solver(A, p, B=B, v0=v0,
                                   ortho_const=ortho_const, key=key,
                                   dtype=dtype, shard=shard,
                                   inner_trace_cap=inner_trace_cap)
    if segment_outer is None:
        s = _run_segment_jit(cfg, A, B, K, inner_solve, shifts, s0,
                             jnp.asarray((1 << 31) - 1, jnp.int32), debug,
                             monitor, convtest)
    else:
        s = s0
        seg_end = 0
        while True:
            seg_end += int(segment_outer)
            s = _run_segment_jit(cfg, A, B, K, inner_solve, shifts, s,
                                 jnp.asarray(seg_end, jnp.int32), debug,
                                 monitor, convtest)
            # host-side copy of run_segment's cond (minus the seg_end cap)
            if bool(s.done) or bool(s.give_up) \
                    or int(s.stats.num_outer_iterations) >= cfg.max_outer \
                    or int(s.stats.num_matvecs) >= cfg.max_matvecs:
                break
    return _extract_jit(cfg, s, shifts, B is not None)


# Persistent jit caches: cfg and the function-valued arguments are static
# (hashable); operators are pytrees. Repeated solves with the same
# configuration reuse the compiled loop instead of re-tracing.
_run_segment_jit = jax.jit(run_segment,
                           static_argnums=(0, 4, 8, 9, 10))
_extract_jit = jax.jit(extract_result, static_argnums=(0, 3))
