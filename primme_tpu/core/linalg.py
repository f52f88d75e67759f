"""Dense numerics substrate: masked kernels under static shapes.

Replaces the reference's ``src/linalg`` (``Num_*_Sprimme`` BLAS/LAPACK
wrappers) with pure-JAX masked dense kernels. The central design move for
TPU: PRIMME's *dynamic* basis size (``basisSize`` growing/shrinking every
iteration) becomes a **traced scalar + column masks over fixed-shape
arrays** — inactive columns are kept *exactly zero*, which makes most
masking free (a zero column contributes nothing to any Gram product or
basis combination) and keeps every op a full-size MXU matmul that XLA
compiles once.

Key kernels:

* :func:`block_ortho` — B-orthonormalization of a block against the basis
  and locked vectors: iterated block classical Gram-Schmidt + CholeskyQR
  with rank-deficiency recovery by random replacement. Reference:
  ``Bortho_block_Sprimme`` (``src/eigs/ortho.c:429``) incl. the random
  substitution path (``src/eigs/main_iter.c:693-728``).
* :func:`solve_H_rr` — masked Rayleigh-Ritz: dense eigendecomposition of
  the active block of H with target-aware sorting. Reference:
  ``solve_H_RR`` (``src/eigs/solve_projection.c:188``).
* :func:`compute_residuals` — the fused X/R/norms hot kernel. Reference:
  ``Num_update_VWXR_Sprimme`` (``src/eigs/auxiliary_eigs_normal.c:155``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..params import Target


def real_dtype(dtype) -> jnp.dtype:
    return jnp.dtype(jnp.zeros((), dtype=dtype).real.dtype)


def machine_eps(dtype) -> float:
    return float(jnp.finfo(real_dtype(dtype)).eps)


_LOW_PREC = (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))


def compute_dtype(dtype) -> jnp.dtype:
    """Accumulation/compute dtype for a given storage dtype. Half-precision
    basis storage (bf16 — the TPU-native dtype — or f16) computes in f32:
    the MXU consumes bf16 operands and accumulates in f32 natively, so
    Gram products off a bf16 basis are f32-accurate for free. This is the
    TPU shape of the reference's half-precision kind, whose dense kernels
    also accumulate in float (``src/include/template_types.h:40-150``)."""
    dt = jnp.dtype(dtype)
    return jnp.dtype(jnp.float32) if dt in _LOW_PREC else dt


def _herm(X):
    return X.conj().swapaxes(-1, -2)


def col_mask(width: int, active: jax.Array, dtype=jnp.bool_) -> jax.Array:
    """[width] mask: index < active."""
    return (jnp.arange(width) < active).astype(dtype)


def mask_cols(X: jax.Array, active: jax.Array) -> jax.Array:
    """Zero out columns with index >= active."""
    return jnp.where(col_mask(X.shape[1], active)[None, :], X, 0)


def gram(X: jax.Array, Y: jax.Array) -> jax.Array:
    """X^H Y at full accumulation precision. Orthogonality hinges on these
    inner products, so on TPU we force HIGHEST (multi-pass f32) rather than
    the default bf16-pass matmul; half-precision operands accumulate into
    f32 (one native MXU pass). Under row-sharding XLA turns this into a
    local gemm + all-reduce (the reference's gemm + ``globalSum``,
    ``src/eigs/update_projection.c:136``)."""
    cd = compute_dtype(jnp.result_type(X.dtype, Y.dtype))
    return jnp.matmul(_herm(X), Y, preferred_element_type=cd,
                      precision=jax.lax.Precision.HIGHEST).astype(cd)


def bcomb(V: jax.Array, C: jax.Array) -> jax.Array:
    """Basis combination V @ C at HIGHEST precision (used for basis updates,
    where low-precision drift would break orthonormality). Half-precision
    operands produce f32 output — rounding back to storage precision is the
    caller's store-time decision."""
    cd = compute_dtype(jnp.result_type(V.dtype, C.dtype))
    return jnp.matmul(V, C, preferred_element_type=cd,
                      precision=jax.lax.Precision.HIGHEST).astype(cd)


def _prefix_buckets(width: int, floor: int = 16):
    """Static column-count ladder 0, floor, 2*floor, ..., width."""
    ws = [0]
    w = floor
    while w < width:
        ws.append(w)
        w *= 2
    ws.append(width)
    return ws


def prefix_project(P: jax.Array, C: jax.Array, X: jax.Array, count,
                   floor: int = 16) -> jax.Array:
    """``X - P_w (C_w^H X)`` where ``w`` is the smallest bucket of static
    column counts covering the traced ``count``.

    Columns ``>= count`` of ``P`` and ``C`` MUST be exactly zero — the
    result is then identical to the full-width projection while touching
    only O(count) HBM. The reference operates on ``[n, numLocked]`` views
    directly (``src/eigs/ortho.c:249``, ``inner_solve.c:769``); XLA's
    static shapes would otherwise force every locked-space projection to
    stream the whole ``lockmax`` allocation even with zero pairs locked.
    """
    W = P.shape[1]
    if W <= floor:
        return X - bcomb(P, gram(C, X))
    ws = _prefix_buckets(W, floor)

    def mk(w):
        if w == 0:
            return lambda X: X
        return lambda X: X - bcomb(P[:, :w], gram(C[:, :w], X))

    idx = jnp.sum((count > jnp.asarray(ws, jnp.int32)).astype(jnp.int32))
    return jax.lax.switch(idx, [mk(w) for w in ws], X)


def prefix_project2(Q: jax.Array, BQ: jax.Array, X: jax.Array,
                    BX: jax.Array, count, same: bool,
                    floor: int = 16) -> Tuple[jax.Array, jax.Array]:
    """Project ``X`` (and ``BX``, sharing the overlap ``BQ_w^H X``) out of
    the first ``count`` columns of ``(Q, BQ)`` with bucketed reads — the
    B-ortho analogue of :func:`prefix_project`. ``same=True`` means ``BX``
    aliases ``X`` (no mass matrix)."""
    W = Q.shape[1]

    def full(X, BX):
        oq = gram(BQ, X)
        X2 = X - bcomb(Q, oq)
        BX2 = X2 if same else BX - bcomb(BQ, oq)
        return X2, BX2

    if W <= floor:
        return full(X, BX)
    ws = _prefix_buckets(W, floor)

    def mk(w):
        if w == 0:
            return lambda args: args

        def f(args):
            X, BX = args
            oq = gram(BQ[:, :w], X)
            X2 = X - bcomb(Q[:, :w], oq)
            BX2 = X2 if same else BX - bcomb(BQ[:, :w], oq)
            return X2, BX2
        return f

    idx = jnp.sum((count > jnp.asarray(ws, jnp.int32)).astype(jnp.int32))
    return jax.lax.switch(idx, [mk(w) for w in ws], (X, BX))


# ---------------------------------------------------------------------------
# Block B-orthonormalization
# ---------------------------------------------------------------------------

class OrthoResult(NamedTuple):
    X: jax.Array          # orthonormalized block [n, bs]
    BX: jax.Array         # B @ X (alias of X when B is None)
    n_random: jax.Array   # how many columns were replaced by random vectors


def _chol_qr(X, BX, active_bs, thresh2):
    """One CholeskyQR pass on the active columns of X, with deficiency
    detection. ``thresh2`` is a per-column squared-norm floor (relative to
    the pre-projection column norms, Daniel's-test style). Returns
    (X, BX, bad_mask) where bad_mask marks columns whose B-norm collapsed
    (linearly dependent — candidates for random replacement, cf. ortho.c's
    Daniel's-test failure path)."""
    bs = X.shape[1]
    G = gram(X, BX)
    d = jnp.real(jnp.diagonal(G))
    amask = col_mask(bs, active_bs)
    # A column is "bad" if its projected norm collapsed or went non-finite.
    bad = ((d <= thresh2) | ~jnp.isfinite(d)) & amask
    # Regularize: bad/inactive columns get identity rows/cols so chol succeeds.
    unit = jnp.where(bad | ~amask, 1.0, 0.0)
    keep = (~(bad | ~amask)).astype(X.dtype)
    Gs = G * keep[:, None] * keep[None, :] + jnp.diag(unit).astype(X.dtype)
    L = jnp.linalg.cholesky(Gs)  # lower, Gs = L L^H
    # X <- X L^{-H} so that X^H B X = I on the good active columns.
    # Invert the tiny replicated factor and apply it as a matmul: a
    # triangular_solve with an [n, bs] right-hand side runs on the TPU's
    # slow serial path (~120us at n=262k) while the MXU streams the same
    # update at HBM speed (~12us). G is CGS-conditioned so the explicit
    # small inverse is safe.
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(bs, dtype=X.dtype), lower=True)
    C = _herm(Linv)
    Xn = bcomb(X, C).astype(X.dtype)
    BXn = bcomb(BX, C).astype(BX.dtype)
    # Bad / inactive columns are zeroed (they were fed the identity).
    good = (amask & ~bad).astype(X.dtype)
    return Xn * good[None, :], BXn * good[None, :], bad


def block_ortho(X, basis, locked, active_bs, key, Bop=None,
                n_iters: int = 2, locked_count=None) -> OrthoResult:
    """Scoped entry (``pt_ortho`` profiler attribution, timeOrtho) for
    :func:`_block_ortho_impl` — see its docstring."""
    with jax.named_scope("pt_ortho"):
        return _block_ortho_impl(X, basis, locked, active_bs, key,
                                 Bop=Bop, n_iters=n_iters,
                                 locked_count=locked_count)


def _block_ortho_impl(X: jax.Array,
                basis: Tuple[jax.Array, jax.Array],
                locked: Optional[Tuple[jax.Array, jax.Array]],
                active_bs: jax.Array,
                key: jax.Array,
                Bop=None,
                n_iters: int = 2,
                locked_count=None,
                ) -> OrthoResult:
    """B-orthonormalize ``X[:, :active_bs]`` against ``basis=(V, BV)``
    (inactive columns of V are exactly zero), ``locked=(Q, BQ)`` and
    internally.

    Iterated block classical Gram-Schmidt (``n_iters`` project-out passes,
    the reference reorthogonalizes once more on Daniel's test failure —
    two passes is the robust fixed-count equivalent) followed by
    CholeskyQR. Columns found dependent are replaced with random vectors
    and re-orthogonalized one extra round (``ortho.c`` random substitution
    + ``main_iter.c:693-728``).
    """
    V, BV = basis
    n = X.shape[0]
    rdt = real_dtype(X.dtype)
    # Dependence is tested at the *storage* precision of the basis: a
    # column projected against a half-precision V retains ~eps(bf16) of
    # junk even when fully dependent, so the Daniel's-test floor must use
    # the coarser eps.
    meps = max(machine_eps(X.dtype), machine_eps(V.dtype))

    def project_out(X, BX):
        ov = gram(BV, X)              # [mmax, bs]; inactive rows exactly 0
        X = X - bcomb(V, ov)
        if Bop is None:
            BX = X
        else:
            BX = BX - bcomb(BV, ov)
        if locked is not None:
            Q, BQ = locked
            if locked_count is not None:
                # locked columns >= locked_count are exactly zero; read a
                # bucketed prefix instead of the whole lockmax allocation
                X, BX = prefix_project2(Q, BQ, X, BX, locked_count,
                                        same=Bop is None)
            else:
                oq = gram(BQ, X)
                X = X - bcomb(Q, oq)
                if Bop is None:
                    BX = X
                else:
                    BX = BX - bcomb(BQ, oq)
        return X, BX

    # Reference norms for dependence detection (before projection).
    BX = Bop.matmat(X) if Bop is not None else X
    nrm0_2 = jnp.maximum(jnp.real(jnp.sum(X.conj() * BX, axis=0)),
                         jnp.asarray(jnp.finfo(rdt).tiny, rdt))
    thresh2 = (meps ** 2 * 64.0) * nrm0_2

    total_bad = jnp.zeros((), jnp.int32)
    for it in range(n_iters):
        X, BX = project_out(X, BX)
        X, BX, bad = _chol_qr(X, BX, active_bs, thresh2)
        if it == 0:
            # Replace dependent columns with fresh random vectors; the next
            # pass re-orthogonalizes them.
            nbad = jnp.sum(bad.astype(jnp.int32))
            total_bad = total_bad + nbad
            key, sub = jax.random.split(key)
            if jnp.issubdtype(X.dtype, jnp.complexfloating):
                rnd = (jax.random.normal(sub, (n, X.shape[1]), rdt) +
                       1j * jax.random.normal(
                           jax.random.fold_in(sub, 1), (n, X.shape[1]), rdt)
                       ).astype(X.dtype)
            else:
                rnd = jax.random.normal(sub, (n, X.shape[1]), X.dtype)
            rnd = rnd / jnp.sqrt(jnp.asarray(n, rdt)).astype(X.dtype)
            X = jnp.where(bad[None, :], rnd, X)
            if Bop is not None:
                BX = jnp.where(bad[None, :], Bop.matmat(rnd), BX)
            else:
                BX = X
            # Columns are now unit-B-norm (or fresh randoms ~ unit norm):
            # subsequent passes test against an O(1) reference.
            thresh2 = jnp.full_like(thresh2, meps ** 2 * 64.0)
    return OrthoResult(X=X, BX=BX, n_random=total_bad)


# ---------------------------------------------------------------------------
# Projected (small dense) eigenproblem with masking + target sort
# ---------------------------------------------------------------------------

def target_sort_keys(w: jax.Array, target: Target, shifts: jax.Array,
                     shift_idx: jax.Array) -> jax.Array:
    """Sort keys so that ``argsort(keys)`` orders Ritz values by target
    preference. ``shifts`` is a padded [max_shifts] vector; ``shift_idx``
    selects the shift for the pair currently sought (PRIMME uses
    ``targetShifts[min(i, numShifts-1)]`` while seeking the i-th value,
    cf. ``src/eigs/auxiliary_eigs.c`` sort routines)."""
    if jnp.issubdtype(w.dtype, jnp.complexfloating):
        # normal (non-Hermitian) operators: complex Ritz values
        # (template_normal.h KIND(N); sorts fall back to real part for
        # extreme targets, modulus for the interior ones)
        if target == Target.smallest:
            return jnp.real(w)
        if target == Target.largest:
            return -jnp.real(w)
        s = shifts[jnp.minimum(shift_idx, shifts.shape[0] - 1)]
        d = jnp.abs(w - s.astype(w.dtype))
        if target == Target.closest_abs:
            return d
        if target == Target.largest_abs:
            return -d
        # geq/leq order complex Ritz values by REAL part relative to the
        # shift (the one total order consistent with the Hermitian case,
        # where these targets are defined; modulus has no geq/leq)
        dr = jnp.real(w) - jnp.real(s)
        big = jnp.asarray(jnp.finfo(jnp.real(w).dtype).max / 8, dr.dtype)
        if target == Target.closest_geq:
            return jnp.where(dr >= 0, dr, big - dr)
        if target == Target.closest_leq:
            return jnp.where(dr <= 0, -dr, big + dr)
        raise ValueError(f"{target} unsupported for normal operators")
    if target == Target.smallest:
        return w
    if target == Target.largest:
        return -w
    s = shifts[jnp.minimum(shift_idx, shifts.shape[0] - 1)]
    d = w - s
    big = jnp.asarray(jnp.finfo(w.dtype).max / 8, w.dtype)
    if target == Target.closest_abs:
        return jnp.abs(d)
    if target == Target.largest_abs:
        return -jnp.abs(d)
    if target == Target.closest_geq:
        return jnp.where(d >= 0, d, big - d)
    if target == Target.closest_leq:
        return jnp.where(d <= 0, -d, big + d)
    raise ValueError(target)


class ProjectedSolution(NamedTuple):
    hvals: jax.Array   # [mmax] Ritz values, target-sorted; inactive -> +inf pad
    hvecs: jax.Array   # [mmax, mmax] coefficient vectors (columns), sorted
    active: jax.Array  # [mmax] bool, col j is a real (in-basis) pair



def _dense_scope(fn):
    """``pt_dense`` profiler attribution (timeDense) for the projected
    solves; see profiling.measure_breakdown."""
    from functools import wraps

    @wraps(fn)
    def wrapped(*a, **k):
        with jax.named_scope("pt_dense"):
            return fn(*a, **k)
    return wrapped

@_dense_scope
def solve_H_rr(H: jax.Array, b: jax.Array, target: Target,
               shifts: jax.Array, shift_idx: jax.Array,
               G: Optional[jax.Array] = None) -> ProjectedSolution:
    """Rayleigh-Ritz on the active ``b x b`` block of ``H`` under static
    shapes (``solve_H_RR``, ``src/eigs/solve_projection.c:188``).

    The inactive diagonal is filled with a decoupled sentinel ramp; after
    ``eigh`` the sentinel pairs are identified by eigenvector support (not
    by value — robust whatever the spectrum) and sorted last.

    ``G`` is the explicit Gram matrix V^H B V of the basis (the
    reference's ``orth=explicit_I`` path, ``src/eigs/primme_c.c:304-319``):
    with a half-precision basis V is orthonormal only to storage eps, so
    the projected problem is the *generalized* pencil H y = theta G y,
    whitened here through the Cholesky factor of G (G is a small
    perturbation of I, so the factorization is benign).
    """
    mmax = H.shape[0]
    amask = col_mask(mmax, b)
    am2 = amask[:, None] & amask[None, :]
    Hm = jnp.where(am2, H, 0)
    if G is not None:
        Gm = jnp.where(am2, G, 0)
        Gm = 0.5 * (Gm + _herm(Gm)) + jnp.diag(
            jnp.where(amask, 0.0, 1.0)).astype(H.dtype)
        L = jnp.linalg.cholesky(Gm)
        Hm = jax.scipy.linalg.solve_triangular(L, Hm, lower=True)
        Hm = _herm(jax.scipy.linalg.solve_triangular(L, _herm(Hm),
                                                     lower=True))
    # Sentinel ramp, scaled above the active spectrum, exactly decoupled.
    scale = 2.0 * jnp.max(jnp.abs(Hm)) + 1.0
    ramp = (1.0 + jnp.arange(mmax, dtype=real_dtype(H.dtype))) * scale
    Hm = Hm + jnp.diag(jnp.where(amask, 0, ramp)).astype(H.dtype)
    w, Z = jnp.linalg.eigh(Hm)
    # A column is a sentinel pair iff its support lives on inactive coords.
    support_inactive = jnp.sum(
        jnp.abs(Z) ** 2 * (~amask).astype(w.dtype)[:, None], axis=0)
    is_pad = support_inactive > 0.5
    if G is not None:
        # back-transform to G-orthonormal coefficients: y = L^{-H} z
        Z = jax.scipy.linalg.solve_triangular(_herm(L), Z, lower=False)
    keys = target_sort_keys(w, target, shifts.astype(w.dtype), shift_idx)
    inf = jnp.asarray(jnp.finfo(w.dtype).max, w.dtype)
    keys = jnp.where(is_pad, inf, keys)
    order = jnp.argsort(keys)
    w = w[order]
    Z = Z[:, order]
    is_pad = is_pad[order]
    # Zero padded coefficient columns so downstream gemms ignore them.
    Z = Z * (~is_pad).astype(Z.dtype)[None, :]
    w = jnp.where(is_pad, inf, w)
    return ProjectedSolution(hvals=w, hvecs=Z, active=~is_pad)


# ---------------------------------------------------------------------------
# Fused candidate residuals (Num_update_VWXR analogue)
# ---------------------------------------------------------------------------

class Candidates(NamedTuple):
    X: jax.Array         # Ritz vectors        [n, c]
    WX: jax.Array        # A X                 [n, c]
    BX: jax.Array        # B X (alias X if B None)
    R: jax.Array         # residuals W h - B X diag(lambda)
    resnorms: jax.Array  # [c] 2-norms of R columns
    xnorms: jax.Array    # [c] 2-norms of X columns (a real Ritz vector has
                         # norm ~1; ~0 flags a pair supported on collapsed
                         # basis columns, whose residual is trivially zero)


def compute_residuals(V, W, BV, hvecs_c, hvals_c) -> Candidates:
    """Fused computation of candidate Ritz vectors and residuals: three
    gemms sharing the coefficient block + one elementwise pass — the TPU
    shape of ``Num_update_VWXR_Sprimme``
    (``src/eigs/auxiliary_eigs_normal.c:101-155``). ``hvecs_c`` is
    ``[mmax, c]``, ``hvals_c`` ``[c]`` (padded entries must have zero
    coefficient columns)."""
    with jax.named_scope("pt_dense"):   # timeDense (flopsDense kernel)
        X = bcomb(V, hvecs_c)
        WX = bcomb(W, hvecs_c)
        BX = X if BV is None else bcomb(BV, hvecs_c)
        lam = jnp.where(jnp.isfinite(hvals_c), hvals_c, 0).astype(X.dtype)
        R = WX - BX * lam[None, :]
        resnorms = jnp.linalg.norm(R, axis=0)
        xnorms = jnp.linalg.norm(X, axis=0)
        return Candidates(X=X, WX=WX, BX=BX, R=R,
                          resnorms=jnp.real(resnorms),
                          xnorms=jnp.real(xnorms))


# ---------------------------------------------------------------------------
# Harmonic and refined extraction (solve_H_Harm / solve_H_Ref,
# src/eigs/solve_projection.c:430,541)
# ---------------------------------------------------------------------------
#
# Like the reference, extraction works from the R factor of the QR of the
# shifted basis image (A - tau B) V  (``update_Q``,
# ``src/eigs/update_W.c:78``): ||(A - tau B) V h|| = ||R h|| at the
# conditioning of R itself (kappa), where a Gram/normal-equations
# formulation would square it — the difference between resolving a
# sigma ~ 1e-9 cluster at f64 and not. The TPU-native twist: instead of
# maintaining Q/R incrementally across expansions/restarts/shift changes
# (update_W.c + restart_refined's coefficient-space updates + the
# recompute-on-shift-change logic), R is recomputed fresh each outer
# iteration by one [n, mmax] Householder QR — W and BV are already
# resident, the QR is a single fused XLA op, and there is no accumulated
# drift or Q storage at all.


def shifted_qr_R(W, BV, b, tau):
    """R factor of the QR of (A - tau B)V = W - tau BV over the active
    columns. Inactive rows/cols of the result are exactly zero. ``W`` and
    ``BV`` must have inactive columns exactly zero (the solver invariant).
    """
    S = W - tau.astype(W.dtype) * BV
    mmax = S.shape[1]
    R = jnp.linalg.qr(S, mode="r")
    if R.shape[0] < mmax:     # n < mmax edge case: pad rows
        R = jnp.concatenate(
            [R, jnp.zeros((mmax - R.shape[0], mmax), R.dtype)], axis=0)
    amask = col_mask(mmax, b)
    return jnp.where(amask[:, None] & amask[None, :], R, 0)


def complement_qr_R(V, W, H, b):
    """R factor (m x m) of the QR of D = W - V H, the component of W = AV
    orthogonal to the (2-orthonormal) basis V. Together with H this gives
    an EXACT per-shift residual norm at kappa (not kappa^2) conditioning:

        ||(A - tau) V h||^2 = ||(H - tau I) h||^2 + ||G h||^2

    because (A - tau)V = V (H - tau I) + Qp G with Qp = orth(D) and
    Qp perpendicular to V. This replaces the reference's incremental
    QR of the full-height (A - tau B)V (``update_W.c:78``) with one
    [n, m] panel QR per outer iteration and NO per-shift tall work.
    Standard problems only (V must be 2-orthonormal, B = I)."""
    mmax = W.shape[1]
    amask = col_mask(mmax, b)
    am2 = amask[:, None] & amask[None, :]
    Hm = jnp.where(am2, H, 0)
    D = W - bcomb(V, Hm)
    G = jnp.linalg.qr(D, mode="r")
    if G.shape[0] < mmax:
        G = jnp.concatenate(
            [G, jnp.zeros((mmax - G.shape[0], mmax), G.dtype)], axis=0)
    return jnp.where(am2, G, 0)


@_dense_scope
def solve_H_refined(H, G, b, target: Target, shifts, shift_idx,
                    anorm=None, conv_eps=None):
    """Refined extraction (``solve_H_Ref``,
    ``src/eigs/solve_projection.c:541`` + the cluster machinery of
    ``prepare_vecs``, ``solve_projection.c:842``).

    Per-pair refinement at exact kappa conditioning: for each target pair
    the coefficient vector minimizes ||(A - tau_i)V h|| over unit h with
    tau_i its own Rayleigh-Ritz value — the smallest right singular
    vector of the stacked [2m, m] matrix [H - tau_i I; G] (see
    :func:`complement_qr_R`), one small vmapped SVD per pair. Pairs keep
    the Rayleigh-Ritz target order; near-duplicate refined vectors from
    clustered shifts are sequentially orthonormalized (the reference's
    "arbitrary vectors" handling) and then re-diagonalized per cluster by
    one block-diagonal eigh (``prepare_vecs`` gap test: a cluster is a
    run of pairs whose singular vectors cannot be separated at working
    precision given the accuracy the eigenvectors need).

    ``anorm``/``conv_eps`` feed the cluster gap test; ``None`` disables
    clustering (first iteration).
    """
    mmax = H.shape[0]
    rdt = real_dtype(H.dtype)
    inf = jnp.asarray(jnp.finfo(rdt).max, rdt)
    meps = machine_eps(H.dtype)
    amask = col_mask(mmax, b)
    am2 = amask[:, None] & amask[None, :]
    Hm = jnp.where(am2, H, 0)
    Gm = jnp.where(am2, G, 0)

    base = solve_H_rr(H, b, target, shifts, shift_idx)
    s0 = shifts[jnp.minimum(shift_idx, shifts.shape[0] - 1)]
    taus = jnp.where(base.active, jnp.where(
        jnp.isfinite(base.hvals), base.hvals, 0), s0.astype(base.hvals.dtype))

    # sentinel ramp above every per-pair spectrum for the pad columns
    tmax = jnp.max(jnp.where(base.active, jnp.abs(taus), 0.0))
    scale = 2.0 * (jnp.max(jnp.abs(Hm)) + jnp.max(jnp.abs(Gm)) + tmax) + 1.0
    ramp = (1.0 + jnp.arange(mmax, dtype=rdt)) * scale

    def one(tau):
        top = Hm - tau.astype(H.dtype) * jnp.diag(amask.astype(H.dtype))
        top = top + jnp.diag(jnp.where(amask, 0.0, ramp)).astype(H.dtype)
        C = jnp.concatenate([top, Gm], axis=0)          # [2m, m]
        _, sv, Vh = jnp.linalg.svd(C, full_matrices=False)
        return Vh[-1].conj(), sv[-1]                    # smallest pair

    hv, smin = jax.vmap(one)(taus)
    hv = hv.T                                            # [mmax, mmax] cols
    hv = hv * base.active.astype(H.dtype)[None, :]

    # Sequential orthonormalization in target order: a duplicate column
    # (clustered tau) gets an orthonormal completion whose large residual
    # sends it back to the unconverged pool (prepare_vecs arbitrary
    # vectors). Pads are substituted by identity columns for the QR and
    # re-zeroed after.
    hv = jnp.where(base.active[None, :], hv, jnp.eye(mmax, dtype=H.dtype))
    hv = jnp.linalg.qr(hv)[0]
    hv = hv * base.active.astype(H.dtype)[None, :]

    # Rayleigh quotients of the (orthonormal) refined vectors
    rq = jnp.real(jnp.sum(hv.conj() * (Hm @ hv), axis=0))
    is_pad = ~base.active

    # ---- cluster detection (prepare_vecs gap test) -----------------------
    # sin(svec error) ~ sigma_max*macheps/dsigma must beat
    # sin(evec needed) ~ anorm*eps/dlambda; join the cluster when it can't.
    if anorm is None or conv_eps is None:
        brk = jnp.ones((mmax,), jnp.bool_)
    else:
        an = jnp.maximum(jnp.asarray(anorm, rdt), jnp.finfo(rdt).tiny)
        ce = jnp.maximum(jnp.asarray(conv_eps, rdt), 6.28 * meps)
        smax = jnp.max(jnp.where(is_pad, 0.0, jnp.abs(taus))) \
            + jnp.max(jnp.abs(Gm))
        dlam = jnp.abs(rq - jnp.roll(rq, 1))
        min_diff = jnp.sqrt(2.0) * smax * meps * dlam / (an * ce)
        dsv = jnp.abs(smin - jnp.roll(smin, 1))
        brk = (dsv >= min_diff) | is_pad | jnp.roll(is_pad, 1)
        brk = brk.at[0].set(True)
    cid = jnp.cumsum(brk.astype(jnp.int32)) - 1

    # ---- within-cluster Rayleigh-Ritz (all clusters via one eigh) --------
    S = gram(hv, Hm @ hv)
    S = 0.5 * (S + _herm(S))
    same = (cid[:, None] == cid[None, :]) & \
        (~is_pad[:, None]) & (~is_pad[None, :])
    Sc = jnp.where(same, S, 0)
    sscale = 2.0 * jnp.max(jnp.abs(Sc)) + 1.0
    sramp = (1.0 + jnp.arange(mmax, dtype=rdt)) * sscale
    Sc = Sc + jnp.diag(jnp.where(is_pad, sramp, 0.0)).astype(H.dtype)
    w, Z = jnp.linalg.eigh(Sc)
    # Sc is exactly block-diagonal, so every eigenvector is supported on a
    # single cluster; recover its cluster id from the support.
    colw = jnp.abs(Z) ** 2
    col_cid = jnp.sum(colw * cid.astype(rdt)[:, None], axis=0)
    col_pad = jnp.sum(colw * is_pad.astype(rdt)[:, None], axis=0) > 0.5
    hv2 = bcomb(hv, Z)

    # final order: clusters keep their (target-ordered) position; within a
    # cluster sort by target keys of the RR values
    tk = target_sort_keys(w, target, shifts.astype(rdt), shift_idx)
    tk = jnp.where(col_pad, inf, tk)
    ckey = jnp.where(col_pad, jnp.asarray(mmax + 1, rdt),
                     jnp.round(col_cid))
    order2 = jnp.lexsort((tk, ckey))
    hv2 = hv2[:, order2]
    w = w[order2]
    col_pad = col_pad[order2]

    hv2 = hv2 * (~col_pad).astype(H.dtype)[None, :]
    hvals = jnp.where(col_pad, inf, w)
    return ProjectedSolution(hvals=hvals, hvecs=hv2, active=~col_pad)


@_dense_scope
def solve_H_harmonic(H, R, b, target: Target, shifts, shift_idx):
    """Harmonic Rayleigh-Ritz (``solve_H_Harm``,
    ``src/eigs/solve_projection.c:430``): solve the Hermitian-definite
    pencil (H - tau I) h = mu ((A-tau)V)^H ((A-tau)V) h, whose right side
    Gram factors EXACTLY as R^H R — so the Cholesky factor is R^H itself
    (kappa(R) conditioning, never forming the squared Gram). Harmonic
    values theta = tau + 1/mu sorted by target; returned values are the
    Rayleigh quotients (as the reference computes hVals from H)."""
    mmax = H.shape[0]
    rdt = real_dtype(H.dtype)
    amask = col_mask(mmax, b)
    am2 = amask[:, None] & amask[None, :]
    tau = shifts[jnp.minimum(shift_idx, shifts.shape[0] - 1)].astype(rdt)

    Rm = jnp.where(am2, R, 0)
    # unit diagonal on inactive coords (decoupled pencil there)
    Rm = Rm + jnp.diag(jnp.where(amask, 0.0, 1.0)).astype(H.dtype)
    # Clamp a (near-)singular diagonal — the basis contains a vector with
    # (A - tau B)v ~ 0 (a converged pair AT the shift). The reference's
    # explicit-QtQ Cholesky regularizes the same way; kappa(R) stays
    # bounded by ~1/(32 macheps).
    meps = machine_eps(H.dtype)
    d = jnp.diagonal(Rm)
    mag = jnp.abs(d)
    floor = 32.0 * meps * jnp.maximum(jnp.max(mag), jnp.finfo(rdt).tiny)
    tiny = jnp.finfo(rdt).tiny
    phase = jnp.where(mag > tiny, d / jnp.maximum(mag, tiny),
                      jnp.ones((), H.dtype))
    dnew = jnp.where(mag < floor, phase * floor.astype(H.dtype), d)
    Rm = Rm + jnp.diag(dnew - d)
    L = _herm(Rm)                            # lower; L L^H = R^H R = G2
    Hm = jnp.where(am2, H, 0) - tau.astype(H.dtype) * jnp.diag(
        amask.astype(H.dtype))
    # S = L^{-1} (H - tau I) L^{-H}
    S1 = jax.scipy.linalg.solve_triangular(L, Hm, lower=True)
    S = jax.scipy.linalg.solve_triangular(L, _herm(S1), lower=True)
    S = 0.5 * (S + _herm(S))
    # Sentinel ramp on inactive coords (decoupled: Hm zero there, L unit).
    scale = 2.0 * jnp.max(jnp.abs(S)) + 1.0
    ramp = (1.0 + jnp.arange(mmax, dtype=rdt)) * scale
    S = S + jnp.diag(jnp.where(amask, 0, ramp)).astype(H.dtype)
    mu, Z = jnp.linalg.eigh(S)
    hv = jax.scipy.linalg.solve_triangular(_herm(L), Z, lower=False)

    support_inactive = jnp.sum(
        jnp.abs(Z) ** 2 * (~amask).astype(rdt)[:, None], axis=0)
    is_pad = support_inactive > 0.5
    # harmonic values for sorting; guard mu ~ 0 (theta -> +/- inf)
    safe_mu = jnp.where(jnp.abs(mu) < jnp.finfo(rdt).tiny,
                        jnp.finfo(rdt).tiny, mu)
    theta = tau + 1.0 / safe_mu
    keys = target_sort_keys(theta, target, shifts.astype(rdt), shift_idx)
    inf = jnp.asarray(jnp.finfo(rdt).max, rdt)
    keys = jnp.where(is_pad, inf, keys)
    order = jnp.argsort(keys)
    hv = hv[:, order]
    is_pad = is_pad[order]
    # Orthonormalize the coefficient vectors IN the harmonic order — the
    # reference's ``Bortho_local`` after the R backsolve
    # (``solve_projection.c:496``). hv = R^{-H}-transformed vectors can be
    # nearly dependent when R is nearly singular (e.g. AV near
    # rank-deficient late in a solve); QR gives dependent columns an orthonormal
    # completion whose large residual sends them back to the unconverged
    # pool instead of emitting a spurious near-zero Ritz vector.
    hv = jnp.where((~is_pad)[None, :], hv, jnp.eye(mmax, dtype=H.dtype))
    hv = jnp.linalg.qr(hv)[0]
    hv = hv * (~is_pad).astype(H.dtype)[None, :]
    Hm2 = jnp.where(am2, H, 0)
    rq = jnp.real(jnp.sum(hv.conj() * (Hm2 @ hv), axis=0))
    hvals = jnp.where(is_pad, inf, rq)
    return ProjectedSolution(hvals=hvals, hvecs=hv, active=~is_pad)


def orthonormalize_coeffs(C, valid, dtype_eps):
    """Orthonormalize small coefficient columns (rank-revealing, eigh
    based); invalid/dependent columns zeroed. Used at restart when the
    extraction produced non-orthogonal coefficient vectors (refined /
    harmonic; ``ortho_coefficient_vectors``, ``src/eigs/restart.c:2330``)."""
    C = C * valid.astype(C.dtype)[None, :]
    G = gram(C, C)
    w, U = jnp.linalg.eigh(G)
    wmax = jnp.maximum(jnp.max(w), 1.0)
    ok = w > 64.0 * dtype_eps * wmax
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, w, 1.0)), 0.0)
    Q = bcomb(C, U * inv[None, :].astype(C.dtype))
    return Q, ok


# ---------------------------------------------------------------------------
# Normal (non-Hermitian) projected solve — the KIND(N) axis of the template
# system (src/eigs/template_normal.h:40-80; solve_H uses Schur, Num_gees,
# src/eigs/solve_projection.c:358)
# ---------------------------------------------------------------------------

@_dense_scope
def solve_H_normal(H, b, target: Target, shifts, shift_idx
                   ) -> ProjectedSolution:
    """Projected solve for a *normal* operator: H = V^H A V is not
    Hermitian and the Ritz values are complex. The reference runs a Schur
    decomposition on the host (``Num_gees``); small replicated H makes a
    host callback the natural TPU analogue. The eigenvector matrix of a
    normal operator restricted to a subspace is re-orthonormalized by QR
    in sorted order (Schur-vector equivalent)."""
    mmax = H.shape[0]
    rdt = real_dtype(H.dtype)
    cdt = jnp.dtype(jnp.complex64 if rdt == jnp.float32 else jnp.complex128)
    amask = col_mask(mmax, b)
    am2 = amask[:, None] & amask[None, :]
    Hm = jnp.where(am2, H, 0).astype(cdt)
    scale = 2.0 * jnp.max(jnp.abs(Hm)) + 1.0
    ramp = ((1.0 + jnp.arange(mmax, dtype=rdt)) * scale).astype(cdt)
    Hm = Hm + jnp.diag(jnp.where(amask, jnp.zeros((), cdt), ramp))

    def _eig(Hh):
        import numpy as np

        w, Z = np.linalg.eig(np.asarray(Hh))
        return w.astype(Hh.dtype), Z.astype(Hh.dtype)

    w, Z = jax.pure_callback(
        _eig,
        (jax.ShapeDtypeStruct((mmax,), cdt),
         jax.ShapeDtypeStruct((mmax, mmax), cdt)), Hm, vmap_method="sequential")

    support_inactive = jnp.sum(
        jnp.abs(Z) ** 2 * (~amask).astype(rdt)[:, None], axis=0)
    nrm2 = jnp.maximum(jnp.sum(jnp.abs(Z) ** 2, axis=0),
                       jnp.finfo(rdt).tiny)
    is_pad = (support_inactive / nrm2) > 0.5
    keys = target_sort_keys(w, target, shifts.astype(rdt), shift_idx)
    inf = jnp.asarray(jnp.finfo(rdt).max, rdt)
    keys = jnp.where(is_pad, inf, keys)
    order = jnp.argsort(keys)
    w = w[order]
    Z = Z[:, order]
    is_pad = is_pad[order]
    Z = Z * (~is_pad).astype(cdt)[None, :]
    # eigenvectors of a normal matrix are orthogonal in exact arithmetic;
    # QR enforces it numerically (and resolves defective near-degeneracies)
    Z = jnp.linalg.qr(Z)[0]
    Z = Z * (~is_pad).astype(cdt)[None, :]
    winf = jnp.asarray(jnp.finfo(rdt).max, cdt)
    w = jnp.where(is_pad, winf, w)
    return ProjectedSolution(hvals=w, hvecs=Z, active=~is_pad)
