"""Singular value solver: two-stage hybrid SVDS.

TPU re-design of the reference's SVDS driver (``src/svds/primme_svds_c.c:219``):
compute k singular triplets of a rectangular operator A by running the
eigensolver on one of three operators (``primme_svds_op_*``,
``include/primme_svds.h:59-64``):

* ``AtA``  — A^H A (n x n), used when m >= n,
* ``AAt``  — A A^H (m x m), used when m < n,
* ``augmented`` — [[0, A^H], [A, 0]] ((m+n) x (m+n)).

The **hybrid** method (``primme_svds_hybrid``) runs stage 1 on the normal
equations (fast: singular values squared separate well) and stage 2 on the
augmented operator, seeded with stage-1 triplets as initial guesses and
with already-converged triplets as orthogonal constraints — the augmented
stage restores full accuracy that squaring loses
(``primme_svds_c.c:603-610`` for the tolerance/aNorm squaring,
``copy_last_params_to_svds:856`` for the u = A v / sigma scaling).

Target mapping follows ``primme_svds_interface.c:372-384``: largest ->
eigen largest; smallest -> eigen smallest on normal eqs / closest_geq with
safeguarded shifts sqrt((sigma-r)*sigma) on the augmented
(``primme_svds_c.c:703-741``); closest_abs -> closest_abs with shifts
(squared for normal eqs).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import params as prm
from .params import (PrimmeParams, Target, Method, set_method,
                     InitBasisMode, Projection)
from .operators import LinearOperator, FunctionOperator, aslinearoperator
from .core.solver import solve_eigs


def _normal_op(A: LinearOperator, use_ata: bool) -> FunctionOperator:
    """A^H A (use_ata) or A A^H as a square operator."""
    m, n = A.shape
    if use_ata:
        return FunctionOperator(lambda X: A.rmatmat(A.matmat(X)),
                                (n, n), A.dtype)
    return FunctionOperator(lambda X: A.matmat(A.rmatmat(X)),
                            (m, m), A.dtype)


def _aug_op(A: LinearOperator, pad_to: int = 1) -> FunctionOperator:
    """Augmented [[0, A^H], [A, 0]] acting on stacked [v; u]
    (v: n rows, u: m rows), as in ``matrixMatvec_eigs_Sprimme``
    (``src/svds/primme_svds_c.c``).

    ``pad_to`` > 1 (the mesh shard count): each half is zero-padded to a
    shard multiple so the [v; u] split is shard-ALIGNED — the reference
    runs both stages under the same row distribution
    (``primme_svds_c.c:219`` flow) and an unaligned slice at row ``n``
    would make GSPMD reshard the whole block every matvec. The pad slots
    are exact null directions of the operator (mapped to zero), joining
    the ``|m - n|`` genuine null vectors the augmented operator has
    anyway; the closest_geq floor shift keeps both sorted out of SM
    solves."""
    m, n = A.shape
    n_p = -(-n // pad_to) * pad_to
    m_p = -(-m // pad_to) * pad_to

    def f(X):
        V, U = X[:n_p][:n], X[n_p:][:m]
        top, bot = A.rmatmat(U), A.matmat(V)
        if n_p > n:
            top = jnp.pad(top, ((0, n_p - n), (0, 0)))
        if m_p > m:
            bot = jnp.pad(bot, ((0, m_p - m), (0, 0)))
        return jnp.concatenate([top, bot], axis=0)

    return FunctionOperator(f, (m_p + n_p, m_p + n_p), A.dtype)


def _aug_stack(Vv, U, n_p: int, m_p: int):
    """Stack [v; u]/sqrt(2) into the (padded) augmented coordinates."""
    n, m = Vv.shape[0], U.shape[0]
    sq2 = np.sqrt(2.0)
    Vp = jnp.pad(Vv, ((0, n_p - n), (0, 0))) if n_p > n else Vv
    Up = jnp.pad(U, ((0, m_p - m), (0, 0))) if m_p > m else U
    return jnp.concatenate([Vp, Up], axis=0) / sq2


def _true_resnorms(A, U, V, svals):
    """resNorm = sqrt(||A v - s u||^2 + ||A^H u - s v||^2)
    (``primme_svds_c.c`` compute_resNorm)."""
    sv = svals[None, :].astype(U.dtype)
    R1 = A.matmat(V) - U * sv
    R2 = A.rmatmat(U) - V * sv
    return jnp.sqrt(jnp.sum(jnp.abs(R1) ** 2, axis=0)
                    + jnp.sum(jnp.abs(R2) ** 2, axis=0))


def svds(A: Any, k: int = 6, ncv: Optional[int] = None, tol: float = 0.0,
         which: str = "LM", v0: Any = None, u0: Any = None,
         maxiter: Optional[int] = None, return_singular_vectors: bool = True,
         method: str = "hybrid", methodStage1: Optional[Any] = None,
         methodStage2: Optional[Any] = None, sigma: Optional[float] = None,
         precAHA: Any = None, precAAH: Any = None, precAug: Any = None,
         maxBlockSize: int = 0, return_stats: bool = False,
         raise_for_unconverged: bool = True, seed: int = 0,
         aNorm: float = 0.0, mesh: Any = None,
         segment_outer: Optional[int] = None,
         stage1_params: Optional[dict] = None,
         stage2_params: Optional[dict] = None,
         orthou0: Any = None, orthov0: Any = None,
         convtest: Any = None, monitor: Any = None,
         return_history: bool = False):
    """Compute k singular triplets of the rectangular operator ``A``.

    Mirrors the reference Python binding (``Python/primme.pyx:1074``) with
    scipy's ``svds`` calling convention. ``which`` in {'LM', 'SM'} or a
    numeric value (closest_abs). ``method`` in {'hybrid',
    'normalequations', 'augmented'} (``primme_svds_set_method``,
    ``src/svds/primme_svds_interface.c:219``).

    ``orthou0``/``orthov0``: seek triplets orthogonal to these (ideally
    orthonormal) left/right constraint vectors — a deflated solve
    resuming a partial SVD (``primme.pyx:1127-1134``); if only one side
    is given the other is completed through the operator (QR of ``A v``
    / ``A^H u``). ``convtest(svals, resnorms, tol, anorm)`` is a
    user-defined per-triplet convergence test operating on arrays of
    singular values and TRIPLET-scale residual norms (each stage's
    native residual is converted before the call; must be
    jax-traceable). ``monitor(stage, event, ...)`` receives the eigsh
    monitor event stream tagged with the driving stage (1 = first
    stage on the normal equations, 2 = augmented refinement) — the
    reference's ``monitor_stage1/stage2`` split
    (``src/svds/primme_svds_c.c:1763+``); ``return_history`` collects
    the same per-stage records into ``stats['hist']``.
    """
    Aop = aslinearoperator(A)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis, None))

        def _shard_leaf(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and                     x.shape[0] % mesh.devices.size == 0:
                spec = P(axis, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))
            return x

        Aop = jax.tree_util.tree_map(_shard_leaf, Aop)
    m, n = Aop.shape
    kmax = min(m, n)
    if not (0 < k <= kmax):
        raise ValueError(f"k={k} out of range for {m}x{n}")
    use_ata = n <= m

    shifts: tuple = ()
    if isinstance(which, (int, float)) and not isinstance(which, bool):
        sigma = float(which)
        which = "CA"
    which = str(which).upper()
    if which == "SM" and sigma is not None or which == "CA":
        which = "CA"
        shifts = (float(sigma if sigma is not None else 0.0),)

    eps = float(tol)
    stats_all: dict = {}

    def merge_stats(st, prefix):
        for kk, vv in st._asdict().items():
            stats_all[f"{prefix}_{kk}"] = np.asarray(vv).item()

    # ------------------------------------------------------------------
    # External orthogonal constraints (primme.pyx check_pair semantics:
    # swapped arguments tolerated, missing side completed through A)
    # ------------------------------------------------------------------
    ou = ov = None
    if orthou0 is not None or orthov0 is not None:
        ou = np.asarray(orthou0) if orthou0 is not None else None
        ov = np.asarray(orthov0) if orthov0 is not None else None
        if ou is not None and ou.ndim == 1:
            ou = ou[:, None]
        if ov is not None and ov.ndim == 1:
            ov = ov[:, None]
        if ((ou is not None and ou.shape[0] != m)
                or (ov is not None and ov.shape[0] != n)):
            ou, ov = ov, ou
        if ((ou is not None and ou.shape[0] != m)
                or (ov is not None and ov.shape[0] != n)):
            raise ValueError(
                "orthou0/orthov0 do not have the expected number of rows")
        if (ou is not None and ov is not None
                and ou.shape[1] != ov.shape[1]):
            raise ValueError(
                "orthou0 and orthov0 must have the same number of columns")
        if ov is None:
            ov, _ = np.linalg.qr(np.asarray(Aop.rmatmat(jnp.asarray(ou))))
        if ou is None:
            ou, _ = np.linalg.qr(np.asarray(Aop.matmat(jnp.asarray(ov))))
    noc_uv = 0 if ou is None else int(ou.shape[1])

    # ------------------------------------------------------------------
    # Per-stage monitor / history (monitor_stage1/stage2 split,
    # src/svds/primme_svds_c.c:1763+): the eigsh event stream of each
    # inner eigensolve, tagged with its stage, with values/residuals
    # converted to the TRIPLET scale of that stage's operator.
    # ------------------------------------------------------------------
    hist: dict = {kk: [] for kk in (
        "stage", "event", "num_outer", "num_matvecs", "num_locked",
        "num_converged", "basis_size", "num_inner", "svals", "resnorms")}

    def _mk_mon(stage, to_svals, to_resn):
        if monitor is None and not return_history:
            return None

        def mon(event, num_outer, num_matvecs, num_locked, num_converged,
                basis_size, num_inner, hvals, resnorms, inner_trace=None):
            sv = to_svals(np.asarray(hvals))
            rn = to_resn(np.asarray(resnorms), sv)
            if monitor is not None:
                monitor(stage, event, num_outer, num_matvecs, num_locked,
                        num_converged, basis_size, num_inner, sv, rn)
            if return_history:
                hist["stage"].append(stage)
                hist["event"].append(int(event))
                hist["num_outer"].append(int(num_outer))
                hist["num_matvecs"].append(int(num_matvecs))
                hist["num_locked"].append(int(num_locked))
                hist["num_converged"].append(int(num_converged))
                hist["basis_size"].append(int(basis_size))
                hist["num_inner"].append(int(num_inner))
                hist["svals"].append(sv)
                hist["resnorms"].append(rn)

        return mon

    # ------------------------------------------------------------------
    # Stage 1
    # ------------------------------------------------------------------
    stage1_op = method in ("hybrid", "normalequations", "default")
    if method not in ("hybrid", "normalequations", "augmented", "default"):
        raise ValueError(f"unknown svds method {method!r}")

    U = Vv = svals = resn = None
    mv_stage1 = 0
    if stage1_op:
        Nop = _normal_op(Aop, use_ata)
        nn = Nop.shape[0]
        if which == "LM":
            tgt, tsh = Target.largest, ()
        elif which == "SM":
            tgt, tsh = Target.smallest, ()
        else:
            tgt, tsh = Target.closest_abs, tuple(s * s for s in shifts)
        p1 = PrimmeParams(n=nn, num_evals=k, target=tgt, target_shifts=tsh,
                          eps=eps, max_basis_size=(ncv or 0),
                          max_block_size=maxBlockSize,
                          num_ortho_const=noc_uv,
                          a_norm=aNorm * aNorm if aNorm > 0 else 0.0,
                          rng_seed=seed)
        if maxiter:
            # stage 1 gets half the budget, stage 2 the remainder
            # (copy_last_params_from_svds: primme->maxMatvecs =
            # primme_svds->maxMatvecs / 2 for stage 0,
            # src/svds/primme_svds_c.c:677-681)
            p1 = p1.with_(max_matvecs=maxiter // 2)
        if which == "SM":
            # Smallest singular values through the normal equations sit at
            # the squared-conditioned bottom of the spectrum: a deep
            # thick-restart basis converges at the sqrt-gap Lanczos rate,
            # and a blocked solve resolves near-null multiplets (rect.mtx's
            # 1e-9 quadruple) that blockSize=1 provably cannot — the
            # correction equation preserves the complement of span(V).
            # (Measured on test_204: finds 4/4 null members in ~30k
            # matvecs where the reference's augmented stage-2 grind spends
            # 162k and returns 2/4.)
            # Depth choice MEASURED (round 5) on synthetic rect-class
            # fixtures — (nn+1) x nn with a near-null quadruple at
            # 1.5e-9 — at nn in {147, 256, 384, 512, 640, 1000}
            # (BASELINE.md "svds-SM stage-1 depth"): the deep basis is
            # REQUIRED at small nn (depth 64 misses a quadruple member
            # at nn=147 and nn=256) and UNSOUND at large nn (depth 96
            # returns a spurious extra tiny value or misses a member on
            # 4 of 5 runs across nn in {384, 512}, and finds only 1/4
            # at rect.mtx's nn=1000). The crossover sits between 256
            # and 384; the rule is 96 for nn <= 256, else 64. The
            # round-4 nn<=512 cliff placed 512-class problems on the
            # unsound side. PTPU_SVDS_SM_DEPTH overrides for
            # measurement/expert control.
            if not ncv:
                import os as _os
                depth = int(_os.environ.get("PTPU_SVDS_SM_DEPTH", "0")) \
                    or (96 if nn <= 256 else 64)
                p1 = p1.with_(max_basis_size=min(nn, depth))
            if not maxBlockSize:
                p1 = p1.with_(max_block_size=max(1, min(4, k)))
        meth1 = methodStage1 or Method.DEFAULT_MIN_MATVECS
        if isinstance(meth1, str):
            meth1 = Method[meth1.replace("PRIMME_", "")]
        K1 = precAHA if use_ata else precAAH
        K1 = aslinearoperator(K1) if K1 is not None else None
        p1 = set_method(meth1, p1, has_precond=K1 is not None)
        for kk, vv in (stage1_params or {}).items():
            # embedded stage-1 field overrides (the reference's
            # primme_svds.primme.* labels) win over preset defaults
            p1 = prm.set_member(p1, kk, vv)

        g0 = None
        if use_ata and v0 is not None:
            g0 = jnp.asarray(np.atleast_2d(np.asarray(v0).T).T)
        elif not use_ata and u0 is not None:
            g0 = jnp.asarray(np.atleast_2d(np.asarray(u0).T).T)

        inner1 = None
        if p1.max_inner_iterations != 0:
            from .core.inner import jdqmr_inner_solve as inner1

        rdt1 = jnp.zeros((), Aop.dtype).real.dtype
        meps1 = float(jnp.finfo(rdt1).eps)
        eps1 = max(eps if eps > 0 else 1e4 * meps1, 3.16 * meps1)
        an2_hint = aNorm * aNorm  # ||AtA|| = ||A||^2 when given

        def conv_stage1(evals, resnorms, tol, anorm_est):
            """Per-stage normal-equations convergence test
            (``convTestFunATA``, ``src/svds/primme_svds_c.c:1640-1685``):
            the eigen-residual of A^H A approximates sigma * (triplet
            residual), so accept when resnorm/sigma < eps * ||A||, with a
            machine-floor shortcut resnorm < 3.16 eps_mach ||A||^2 (the
            best the squared operator can do)."""
            aop = jnp.maximum(anorm_est, an2_hint)   # ~ ||A||^2
            floor = resnorms < 3.16 * meps1 * jnp.maximum(aop, 1e-300)
            sval = jnp.sqrt(jnp.maximum(jnp.abs(jnp.real(evals)), 0.0))
            srn = resnorms / jnp.maximum(sval, jnp.finfo(rdt1).tiny)
            return floor | (srn < eps1 * jnp.sqrt(jnp.maximum(aop, 0.0)))

        if convtest is not None:
            # user test REPLACES the default (primme.pyx: "The value
            # [tol] is ignored if convtest is provided"), called on the
            # triplet scale: sigma ~ sqrt(theta), triplet residual ~
            # eigen-residual / sigma
            def conv_stage1(evals, resnorms, tol, anorm_est):  # noqa: F811
                aop = jnp.maximum(anorm_est, an2_hint)
                sval = jnp.sqrt(jnp.maximum(jnp.abs(jnp.real(evals)), 0.0))
                srn = resnorms / jnp.maximum(sval, jnp.finfo(rdt1).tiny)
                return convtest(sval, srn, tol,
                                jnp.sqrt(jnp.maximum(aop, 0.0)))

        mon1 = _mk_mon(
            1,
            lambda hv: np.sqrt(np.maximum(np.real(hv), 0.0)),
            lambda rn, sv: rn / np.maximum(sv, np.finfo(np.float64).tiny))
        oc1 = None
        if noc_uv:
            oc1 = jnp.asarray(ov if use_ata else ou)
            if shard is not None:
                oc1 = jax.device_put(oc1, shard)
        r1 = solve_eigs(Nop, p1, K=K1, v0=g0, ortho_const=oc1,
                        inner_solve=inner1,
                        shard=shard, convtest=conv_stage1, monitor=mon1,
                        segment_outer=segment_outer)
        merge_stats(r1.stats, "stage1")
        mv_stage1 = int(np.asarray(r1.stats.num_matvecs))

        w = jnp.maximum(jnp.real(r1.evals), 0.0)
        svals = jnp.sqrt(w)
        safe = jnp.maximum(svals, jnp.finfo(svals.dtype).tiny)
        if use_ata:
            Vv = r1.evecs
            U = Aop.matmat(Vv) / safe[None, :].astype(Aop.dtype)
        else:
            U = r1.evecs
            Vv = Aop.rmatmat(U) / safe[None, :].astype(Aop.dtype)
        # normalize the derived side (guards sigma ~ 0 columns)
        Un = jnp.sqrt(jnp.sum(jnp.abs(U) ** 2, axis=0))
        U = U / jnp.maximum(Un, jnp.finfo(Un.dtype).tiny)[None, :].astype(U.dtype)
        Vn = jnp.sqrt(jnp.sum(jnp.abs(Vv) ** 2, axis=0))
        Vv = Vv / jnp.maximum(Vn, jnp.finfo(Vn.dtype).tiny)[None, :].astype(Vv.dtype)
        resn = _true_resnorms(Aop, U, Vv, svals)
        anorm_est = float(jnp.sqrt(jnp.maximum(r1.stats.anorm_estimate, 0.0)))
    else:
        anorm_est = aNorm

    # ------------------------------------------------------------------
    # Stage 2 (augmented refinement)
    # ------------------------------------------------------------------
    stage2 = (method in ("hybrid", "default")) or method == "augmented"
    if stage2:
        anorm2 = anorm_est if anorm_est > 0 else 0.0
        if anorm2 <= 0.0 and which == "SM":
            # Pure-augmented SM with neither a stage-1 estimate nor a
            # user aNorm: the closest_geq floor shift and the
            # no-null-space convergence test both need ||A|| — without
            # it the floor is ~0 and the augmented operator's |m - n|
            # GENUINE null vectors get targeted as "smallest singular
            # values" (returned sigma ~ 0 where the true smallest is
            # finite). Bound ||A|| with a short power iteration on
            # A^H A (8 steps, a few percent accurate — the floor only
            # needs the right order of magnitude).
            key_pw = jax.random.PRNGKey(seed + 12345)
            x = jax.random.normal(key_pw, (n, 1), dtype=jnp.float32)
            lam = 0.0
            for _ in range(8):
                y = Aop.rmatmat(Aop.matmat(x.astype(Aop.dtype)))
                nrm = float(jnp.linalg.norm(y))
                lam = nrm / max(float(jnp.linalg.norm(x)), 1e-300)
                x = (y / max(nrm, 1e-300)).astype(jnp.float32)
            anorm2 = float(np.sqrt(max(lam, 0.0)))
        # the final raise_for_unconverged bar uses anorm_est — feed the
        # power-iterated ||A|| back so a pure-augmented SM solve is not
        # judged against a collapsed 10*eps*sigma_smallest threshold
        anorm_est = max(anorm_est, anorm2)
        eps_eff = eps if eps > 0 else 1e4 * float(jnp.finfo(
            jnp.dtype(Aop.dtype)).eps)
        rdt = jnp.zeros((), Aop.dtype).real.dtype
        meps = float(jnp.finfo(rdt).eps)

        if svals is not None:
            svh = np.asarray(svals)
            resh = np.asarray(resn)
            conv = resh <= max(eps_eff, 3.16 * meps) * max(anorm2, 1e-300)
            # constraints: converged triplets; guesses: the rest
            conv_idx = np.where(conv)[0]
            rest_idx = np.where(~conv)[0]
        else:
            svh = resh = None
            conv_idx = np.array([], dtype=int)
            rest_idx = np.arange(k)

        ne2 = int(len(rest_idx))
        if ne2 > 0:
            nsh = int(mesh.devices.size) if mesh is not None else 1
            Aug = _aug_op(Aop, pad_to=nsh)
            n_p = -(-n // nsh) * nsh
            m_p = -(-m // nsh) * nsh
            if svh is not None:
                stack = _aug_stack(Vv, U, n_p, m_p)
                oc = stack[:, conv_idx] if len(conv_idx) else None
                g2 = stack[:, rest_idx]
            else:
                oc, g2 = None, None
            if noc_uv:
                # external (orthou0/orthov0) constraints lead, then the
                # stage-1-converged triplets — the reference's svecs
                # layout (numOrthoConst columns first, primme.pyx:1446)
                base_oc = _aug_stack(jnp.asarray(ov).astype(Aop.dtype),
                                     jnp.asarray(ou).astype(Aop.dtype),
                                     n_p, m_p)
                oc = (base_oc if oc is None
                      else jnp.concatenate([base_oc, oc], axis=1))
            if shard is not None:
                if oc is not None:
                    oc = jax.device_put(oc, shard)
                if g2 is not None:
                    g2 = jax.device_put(g2, shard)

            if which == "LM":
                tgt2, tsh2 = Target.largest, ()
            elif which == "SM":
                min_val = max(anorm2 * meps, 1e-300)
                if svh is not None:
                    lows = np.sqrt(np.abs(np.maximum(
                        svh[rest_idx] - resh[rest_idx], 0.0)
                        * svh[rest_idx]))
                    # A stage-1 value at the normal-equations machine
                    # floor carries no information: sigma'^2 <=
                    # ~eps_mach ||A||^2 is indistinguishable from ANY
                    # sigma in [0, sqrt(eps_mach)||A||] (rect.mtx's
                    # 1.5e-9 quadruple reads as ~2e-8 garbage), so its
                    # lower bound must drop to the min_val floor or the
                    # closest_geq target walks right past the true
                    # smallest values (the reference lands on the same
                    # floor because its sigma-scaled rnorm exceeds
                    # sigma' there, primme_svds_c.c:723-735).
                    at_floor = (svh[rest_idx] ** 2
                                <= 10.0 * meps * max(anorm2, 1e-300) ** 2)
                    lows = np.where(at_floor, 0.0, lows)
                    # ONE shift — the smallest sound lower bound — not the
                    # reference's per-pair ascending ladder
                    # (primme_svds_c.c:739): the ladder index advances
                    # with numLocked, which assumes pairs lock
                    # smallest-first; when an easy large pair arrives
                    # converged from the stage-1 guesses it locks first,
                    # the ladder steps PAST the hard small values, and
                    # closest_geq then sorts them last — evicting the
                    # true smallest triplet from the basis (observed on
                    # rect.mtx's 1.5e-9 quadruple, test_204). With a
                    # single floor shift, closest_geq is plain ascending
                    # order above the floor, whatever the lock order.
                    tsh2 = (float(max(np.min(lows), min_val)),)
                else:
                    tsh2 = (min_val,)
                tgt2 = Target.closest_geq
            else:
                tgt2, tsh2 = Target.closest_abs, shifts

            p2 = PrimmeParams(
                n=m_p + n_p, num_evals=ne2, target=tgt2, target_shifts=tsh2,
                eps=eps, max_block_size=maxBlockSize,
                num_ortho_const=(0 if oc is None else int(oc.shape[1])),
                a_norm=anorm2, rng_seed=seed + 1)
            if maxiter:
                # stage 2 gets whatever the user budget has left after
                # stage 1 (primme_svds_c.c caps primmeStage2.maxMatvecs
                # by the remaining global budget)
                p2 = p2.with_(max_matvecs=max(maxiter - mv_stage1, 1))
            if ncv:
                p2 = p2.with_(max_basis_size=ncv)
            if which != "LM":
                # refined extraction works better than RR on the augmented
                # operator for non-largest targets
                # (primme_svds_interface.c:391-396)
                p2 = p2.with_(projection=Projection.refined)
            meth2 = methodStage2 or (Method.DEFAULT_MIN_MATVECS
                                     if which == "LM" else Method.JDQMR)
            if isinstance(meth2, str):
                meth2 = Method[meth2.replace("PRIMME_", "")]
            K2 = aslinearoperator(precAug) if precAug is not None else None
            if K2 is not None and (n_p > n or m_p > m):
                # user preconditioner speaks (m+n); adapt to the padded
                # augmented coordinates (pad slots map to themselves)
                K2in = K2

                def kf(X):
                    Vh, Uh = X[:n_p][:n], X[n_p:][:m]
                    Y = K2in.matmat(jnp.concatenate([Vh, Uh], axis=0))
                    t, b = Y[:n], Y[n:]
                    if n_p > n:
                        t = jnp.pad(t, ((0, n_p - n), (0, 0)))
                    if m_p > m:
                        b = jnp.pad(b, ((0, m_p - m), (0, 0)))
                    return jnp.concatenate([t, b], axis=0)

                K2 = FunctionOperator(kf, (m_p + n_p, m_p + n_p), K2.dtype)
            p2 = set_method(meth2, p2, has_precond=K2 is not None)
            for kk, vv in (stage2_params or {}).items():
                # primme_svds.primmeStage2.* label overrides
                p2 = prm.set_member(p2, kk, vv)

            inner2 = None
            if p2.max_inner_iterations != 0:
                from .core.inner import jdqmr_inner_solve as inner2

            sq2f = float(np.sqrt(2.0))
            eps2 = max(eps_eff, 3.16 * meps)

            def conv_stage2(evals, resnorms, tol, anorm_est):
                """Augmented-operator convergence test (``convTestFunAug``,
                ``src/svds/primme_svds_c.c:1705-1743``): the triplet
                residual is sqrt(2) x the augmented eigen-residual; no
                machine-floor shortcut (never accept null-space
                approximations of [[0, A^H], [A, 0]] as sigma ~ 0)."""
                anormA = jnp.maximum(anorm_est, anorm2)
                return resnorms * sq2f < eps2 * jnp.maximum(anormA, 1e-300)

            if convtest is not None:
                # user test on the triplet scale: sigma ~ |theta|,
                # triplet residual ~ sqrt(2) x augmented eigen-residual
                def conv_stage2(evals, resnorms, tol, anorm_est):  # noqa: F811
                    return convtest(jnp.abs(jnp.real(evals)),
                                    resnorms * sq2f, tol,
                                    jnp.maximum(anorm_est, anorm2))

            mon2 = _mk_mon(2, lambda hv: np.abs(np.real(hv)),
                           lambda rn, sv: rn * sq2f)
            r2 = solve_eigs(Aug, p2, K=K2, v0=g2, ortho_const=oc,
                            inner_solve=inner2, convtest=conv_stage2,
                            monitor=mon2,
                            shard=shard, segment_outer=segment_outer)
            merge_stats(r2.stats, "stage2")

            sv2 = jnp.abs(jnp.real(r2.evals))
            V2 = r2.evecs[:n_p][:n]
            U2 = r2.evecs[n_p:][:m]
            V2n = jnp.sqrt(jnp.sum(jnp.abs(V2) ** 2, axis=0))
            U2n = jnp.sqrt(jnp.sum(jnp.abs(U2) ** 2, axis=0))
            V2 = V2 / jnp.maximum(V2n, 1e-30)[None, :].astype(V2.dtype)
            U2 = U2 / jnp.maximum(U2n, 1e-30)[None, :].astype(U2.dtype)
            res2 = _true_resnorms(Aop, U2, V2, sv2)
            if tgt2 == Target.closest_geq:
                # The augmented operator's |m - n| (+ padding) null
                # vectors are genuine sigma=0 EIGENPAIRS but not
                # singular triplets. The closest_geq floor shift sorts
                # them out, but one can still lock while its Ritz value
                # reads above the floor and land in the output as a
                # sigma~0 "triplet" with a failing triplet residual
                # (measured: pure-augmented SM on a 40x30 fixture; the
                # reference returns an EMPTY result on the same config).
                # Report such a slot as missing — NaN value, inf
                # residual — the same honest-extraction convention the
                # eigensolver uses for absent pairs.
                # machine-zero scale ONLY: a genuine near-null singular
                # value (rect.mtx's 1.5e-9 class) sits orders above
                # 1e3*eps_mach*||A||, while the null artifacts measure
                # ~eps_mach; a merely-unconverged finite triplet must
                # NOT be reclassified (its sigma is O(spectrum))
                junk = (sv2 < 1e3 * meps * max(anorm2, 1e-300)) & (
                    res2 > eps2 * max(anorm2, 1e-300))
                sv2 = jnp.where(junk, jnp.nan, sv2)
                res2 = jnp.where(junk, jnp.inf, res2)

            if svh is not None and len(conv_idx):
                svals = jnp.concatenate([jnp.asarray(svh[conv_idx],
                                                     sv2.dtype), sv2])
                U = jnp.concatenate([U[:, conv_idx], U2], axis=1)
                Vv = jnp.concatenate([Vv[:, conv_idx], V2], axis=1)
                resn = jnp.concatenate([jnp.asarray(resh[conv_idx],
                                                    res2.dtype), res2])
            else:
                svals, U, Vv, resn = sv2, U2, V2, res2

    # sort final triplets (largest-first like scipy's svds reversed order)
    order = np.argsort(-np.asarray(svals)) if which == "LM" else \
        np.argsort(np.asarray(svals))
    svals_h = np.asarray(svals)[order]
    resn_h = np.asarray(resn)[order]
    U_h = np.asarray(U)[:, order]
    V_h = np.asarray(Vv)[:, order]

    if raise_for_unconverged:
        from .api import PrimmeError
        eps_eff = eps if eps > 0 else 1e4 * float(jnp.finfo(
            jnp.dtype(Aop.dtype)).eps)
        bad = int(np.sum(resn_h > 10 * eps_eff * max(anorm_est, svals_h.max()
                                                     if len(svals_h) else 1)))
        if bad:
            raise PrimmeError(f"{bad}/{k} triplets unconverged "
                              f"(resnorms={resn_h})")

    stats_all["resnorms"] = resn_h
    if return_history:
        stats_all["hist"] = hist
    out = [svals_h]
    if return_singular_vectors:
        out = [U_h, svals_h, V_h.conj().T]
    if return_stats:
        out.append(stats_all)
    return tuple(out) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# svds parameter reflection (``primme_svds_params`` label surface,
# ``src/svds/primme_svds_interface.c:406+``): svds-level fields plus the
# two embedded stage configurations addressable as ``primme.*`` /
# ``primmeStage2.*`` — the same dotted labels the reference's bindings
# and text configs use (``tests/COMMON/shared_utils.c``).
# ---------------------------------------------------------------------------

import dataclasses as _dc


_SVDS_ALIASES = {
    "numSvals": "num_svals",
    "aNorm": "a_norm",
    "maxMatvecs": "max_matvecs",
    "maxBasisSize": "max_basis_size",
    "maxBlockSize": "max_block_size",
    "printLevel": "print_level",
    "targetShifts": "target_shifts",
    "methodStage2": "method_stage2",
    "iseed": "rng_seed",
}

_SVDS_TARGETS = ("primme_svds_largest", "primme_svds_smallest",
                 "primme_svds_closest_abs")
_SVDS_METHODS = ("default", "hybrid", "normalequations", "augmented")


@_dc.dataclass(frozen=True)
class SvdsParams:
    """SVD solver configuration (analogue of ``primme_svds_params``,
    ``include/primme_svds.h:78-140``, minus the operator callbacks).

    ``primme`` / ``primme_stage2`` hold the embedded per-stage overrides
    as canonical-name dicts — the reflection route to any field of the
    two inner eigensolver configurations, exactly like the reference's
    embedded ``primme_params`` structs (``include/primme_svds.h:85-89``).
    """

    m: int = 0
    n: int = 0
    num_svals: int = 1
    target: str = "primme_svds_largest"
    target_shifts: tuple = ()
    eps: float = 0.0
    a_norm: float = 0.0
    max_matvecs: int = 0
    max_basis_size: int = 0
    max_block_size: int = 0
    print_level: int = 1
    locking: int = -1
    method: str = "hybrid"
    method_stage2: str = ""
    rng_seed: int = 0
    primme: dict = _dc.field(default_factory=dict)
    primme_stage2: dict = _dc.field(default_factory=dict)

    def with_(self, **kw) -> "SvdsParams":
        return _dc.replace(self, **kw)


def _svds_canonical(name: str) -> str:
    return _SVDS_ALIASES.get(name, name)


def svds_member_names() -> tuple:
    return tuple(f.name for f in _dc.fields(SvdsParams))


# a template params for validating/coercing embedded stage labels
_STAGE_TEMPLATE = PrimmeParams(n=0, num_evals=1)


def svds_set_member(sp: SvdsParams, name: str, value) -> SvdsParams:
    """Set an svds field by label. Dotted labels route into the embedded
    stage configs: ``primme.maxBasisSize`` (stage 1),
    ``primmeStage2.maxInnerIterations`` (stage 2) — validated and
    coerced through the eigensolver's own reflection
    (:func:`primme_tpu.params.set_member`)."""
    if "." in name:
        head, rest = name.split(".", 1)
        if head not in ("primme", "primmeStage2"):
            raise KeyError(f"unknown svds parameter scope: {head!r}")
        # validate + coerce through the eigs reflection layer
        probe = prm.set_member(_STAGE_TEMPLATE, rest, value)
        canon = prm._canonical(rest)
        tgt = "primme" if head == "primme" else "primme_stage2"
        d = dict(getattr(sp, tgt))
        d[canon] = getattr(probe, canon)
        return sp.with_(**{tgt: d})
    name = _svds_canonical(name)
    if name not in svds_member_names():
        raise KeyError(f"unknown primme_svds parameter: {name!r}")
    if name == "target":
        # accept the constant name, its integer code, or the code as a
        # STRING (the C ABI surface passes every value as text) — and
        # validate now, not at run time
        if isinstance(value, str) and value.lstrip("-").isdigit():
            value = int(value)
        if isinstance(value, (int, np.integer)):
            if not 0 <= int(value) < len(_SVDS_TARGETS):
                raise ValueError(
                    f"svds target code {int(value)} out of range "
                    f"0..{len(_SVDS_TARGETS) - 1}")
            value = _SVDS_TARGETS[int(value)]
        if value not in _SVDS_TARGETS:
            raise ValueError(f"unknown svds target {value!r}; expected "
                             f"one of {_SVDS_TARGETS} or its index")
    if name == "target_shifts":
        if isinstance(value, str):
            value = value.replace(",", " ").split()
        value = tuple(float(s) for s in value)
    elif isinstance(value, str) and name not in ("target", "method",
                                                 "method_stage2"):
        cur = getattr(sp, name)
        if isinstance(cur, int):
            value = int(value)
        elif isinstance(cur, float):
            value = float(value)
    if name == "method" and isinstance(value, str):
        # validate at set time like primme_svds_set_method (an unknown
        # preset must not be reported as success to the C ABI caller)
        value = value.replace("primme_svds_", "")
        if value not in _SVDS_METHODS:
            raise ValueError(f"unknown svds method {value!r}; expected "
                             f"one of {_SVDS_METHODS}")
    if name == "method_stage2" and isinstance(value, str) and value:
        # stage-2 presets are EIGENSOLVER methods (primme_preset_method);
        # normalize + validate against the Method catalog now
        from .params import Method
        value = value.replace("PRIMME_", "")
        if value not in Method.__members__:
            raise ValueError(
                f"unknown stage-2 method preset {value!r}; expected a "
                f"primme_preset_method name")
    return sp.with_(**{name: value})


def svds_get_member(sp: SvdsParams, name: str):
    """Get an svds field by label (dotted labels read the embedded stage
    override dicts; unset embedded fields return the stage default)."""
    if "." in name:
        head, rest = name.split(".", 1)
        tgt = {"primme": "primme", "primmeStage2": "primme_stage2"}[head]
        canon = prm._canonical(rest)
        d = getattr(sp, tgt)
        if canon in d:
            return d[canon]
        return prm.get_member(_STAGE_TEMPLATE, rest)
    return getattr(sp, _svds_canonical(name))


def svds_member_info(name: str) -> dict:
    """Type/default metadata (``primme_svds_member_info`` parity)."""
    if "." in name:
        return prm.member_info(name.split(".", 1)[1])
    name = _svds_canonical(name)
    f = {fl.name: fl for fl in _dc.fields(SvdsParams)}.get(name)
    if f is None:
        raise KeyError(name)
    return {"name": name, "type": f.type, "default": f.default}


def svds_display_params(sp: SvdsParams) -> str:
    """Text dump (``primme_svds_display_params`` analogue)."""
    lines = [f"// {'-' * 51}",
             "//              primme_svds configuration",
             f"// {'-' * 51}"]
    for f in _dc.fields(SvdsParams):
        v = getattr(sp, f.name)
        if isinstance(v, dict):
            for kk, vv in v.items():
                scope = ("primme" if f.name == "primme"
                         else "primmeStage2")
                lines.append(f"primme_svds.{scope}.{kk} = {vv}")
        else:
            lines.append(f"primme_svds.{f.name} = {v}")
    return "\n".join(lines)


def svds_from_params(A, sp: SvdsParams, **extra):
    """Run :func:`svds` from an :class:`SvdsParams` configuration (the
    reference's ``dprimme_svds(svals, svecs, resNorms, &primme_svds)``
    flow: configuration struct in, triplets out)."""
    which = {"primme_svds_largest": "LM",
             "primme_svds_smallest": "SM",
             "primme_svds_closest_abs": float(
                 sp.target_shifts[0]) if sp.target_shifts else 0.0
             }[sp.target]
    s1, s2 = dict(sp.primme), dict(sp.primme_stage2)
    if sp.locking >= 0:
        # svds-level locking maps onto both embedded stage configs
        # (primme_svds_params.locking is copied into the stage params by
        # the reference's copy_last_params_from_svds)
        s1.setdefault("locking", int(sp.locking))
        s2.setdefault("locking", int(sp.locking))
    kw = dict(k=sp.num_svals, tol=sp.eps, which=which,
              method=(sp.method or "hybrid"), aNorm=sp.a_norm,
              maxBlockSize=sp.max_block_size, seed=sp.rng_seed,
              stage1_params=s1 or None,
              stage2_params=s2 or None)
    if sp.method_stage2:
        kw["methodStage2"] = sp.method_stage2
    if sp.max_matvecs:
        kw["maxiter"] = sp.max_matvecs
    if sp.max_basis_size:
        kw["ncv"] = sp.max_basis_size
    kw.update(extra)
    return svds(A, **kw)
