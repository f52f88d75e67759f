"""User-facing API: scipy-style ``eigsh`` (and later ``svds``).

Mirrors the reference's Python binding surface (``Python/primme.pyx:284``:
``eigsh(A, k, M, sigma, which, v0, ncv, maxiter, tol, ...)``) on top of the
jitted TPU solver. Inputs may be numpy/jax dense arrays, scipy sparse
matrices, scipy ``LinearOperator``s, or :class:`~primme_tpu.operators.
LinearOperator`; outputs are jax arrays (use ``np.asarray`` to pull to
host).
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import params as prm
from .params import (PrimmeParams, Target, Method, set_method,
                     resolve_defaults)
from .operators import (LinearOperator, aslinearoperator, JacobiPrecond,
                        DiagonalOperator)
from .core.solver import solve_eigs, EigsResult

_WHICH_TO_TARGET = {
    "SA": Target.smallest, "SM": Target.closest_abs,
    "LA": Target.largest, "LM": Target.largest_abs,
    "CLT": Target.closest_leq, "CGT": Target.closest_geq,
}


class PrimmeError(RuntimeError):
    """Solver failure (analogue of ``primme.pyx:1570`` PrimmeError)."""


def eigsh(A: Any, k: int = 6, M: Any = None, sigma: Optional[float] = None,
          which: str = "LM", v0: Any = None, ncv: Optional[int] = None,
          maxiter: Optional[int] = None, tol: float = 0.0,
          OPinv: Any = None, return_eigenvectors: bool = True,
          mode: str = "normal", Minv: Any = None,
          # PRIMME extensions (primme.pyx:284-300)
          lock: Any = None, return_stats: bool = False,
          maxBlockSize: int = 0, minRestartSize: int = 0,
          maxPrevRetain: int = -1, method: Optional[Any] = None,
          locking: Optional[bool] = None, maxMatvecs: Optional[int] = None,
          jacobi: Optional[bool] = None, raise_for_unconverged: bool = True,
          dtype: Any = None, seed: int = 0, projection: Any = None,
          return_history: bool = False, monitor: Any = None,
          mesh: Any = None, convtest: Any = None, printLevel: int = 0,
          maxInnerIterations: Optional[int] = None,
          time_breakdown: bool = False,
          segment_outer: Optional[int] = None,
          verify_spectrum: Optional[int] = None,
          monitor_inner: bool = False,
          profile: Optional[str] = None, **primme_kwargs):
    """Find ``k`` eigenvalues/eigenvectors of the Hermitian operator ``A``
    (optionally generalized: ``A x = lambda M x``).

    Follows ``scipy.sparse.linalg.eigsh``'s calling convention with the
    PRIMME extensions of the reference binding (``Python/primme.pyx:284``).
    ``which`` in {'LM','SM','LA','SA','CLT','CGT'}; 'SM'/'CLT'/'CGT' are
    interior targets around ``sigma`` (default 0).
    """
    # scipy-signature arguments the solver does not implement are
    # validated, not silently ignored (reference parity: primme.pyx:350
    # "Minv: (not supported yet)", :357 "Only 'normal' mode is
    # supported")
    if mode != "normal":
        raise ValueError(
            f"only mode='normal' is supported (got {mode!r}); "
            f"buckling/cayley transformations are not implemented")
    if Minv is not None:
        raise NotImplementedError(
            "Minv is not supported (reference parity: primme.pyx:350); "
            "pass OPinv for a preconditioner")
    # Sparse inputs: prefer the shift-based banded (DIA) layout via RCM
    # reordering — near-HBM-peak on TPU vs slow gathers (see operators.
    # rcm_banded). The permutation is applied here and undone on output.
    perm = None
    try:
        import scipy.sparse as _sp

        if _sp.issparse(A):
            rb = None
            if M is None:
                if mesh is not None and mesh.devices.size > 1:
                    # Under a mesh the global-gather formats (ELL/
                    # BlockELL/WindowedELL) would make GSPMD all-gather
                    # the [n, k] block every matvec. Keep the pure
                    # shift-based banded layout (its pad/slice shifts
                    # lower to neighbor exchanges) and otherwise use the
                    # halo-exchange row partition — the reference's
                    # O(halo) nLocal contract (include/primme_eigs.h:
                    # 188-198, tests/COMMON/petscw.c).
                    from .operators import rcm_banded, BandedOperator
                    cand = rcm_banded(A)
                    if cand is not None and isinstance(cand[0],
                                                       BandedOperator):
                        rb = cand
                    else:
                        from .distributed import HaloELLOperator
                        rb = HaloELLOperator.from_scipy(A, mesh)
                else:
                    from .operators import rcm_banded
                    rb = rcm_banded(A)
            if rb is not None:
                Aop, perm = rb
            else:
                Aop = aslinearoperator(A)
        else:
            Aop = aslinearoperator(A)
    except ImportError:  # pragma: no cover
        Aop = aslinearoperator(A)
    n = Aop.shape[0]
    if Aop.shape[0] != Aop.shape[1]:
        raise ValueError("expected square operator; use svds for rectangular")
    if not (0 < k <= n):
        raise ValueError(f"k={k} out of range for n={n}")

    Mop = aslinearoperator(M) if M is not None else None
    if isinstance(which, str) and which.upper() in _WHICH_TO_TARGET:
        which = which.upper()
        target = _WHICH_TO_TARGET[which]
    else:
        # reference parity (primme.pyx:530-538): a numeric `which` means
        # "eigenvalues closest to this value" (closest_abs) and doubles
        # as sigma; giving both is an error
        try:
            sigma0 = float(which)
        except (TypeError, ValueError):
            raise ValueError(
                f"which must be one of {sorted(_WHICH_TO_TARGET)} or a "
                f"number, got {which!r}")
        if sigma is not None:
            raise ValueError("give a numeric `which` or `sigma`, not both")
        sigma, which, target = sigma0, "SM", Target.closest_abs
    shifts = ()
    if target not in (Target.smallest, Target.largest):
        shifts = (float(sigma) if sigma is not None else 0.0,)
        if which == "LM" and sigma is None:
            target = Target.largest_abs
            shifts = (0.0,)

    p = PrimmeParams(
        n=n, num_evals=k, target=target, target_shifts=shifts,
        eps=float(tol), max_basis_size=(ncv or 0),
        min_restart_size=minRestartSize, max_block_size=maxBlockSize,
        max_prev_retain=(maxPrevRetain if maxPrevRetain >= 0 else prm.UNSET),
        locking=(prm.UNSET if locking is None else int(locking)),
        rng_seed=seed)
    if maxiter is not None:
        p = p.with_(max_outer_iterations=int(maxiter))
    if maxMatvecs is not None:
        p = p.with_(max_matvecs=int(maxMatvecs))
    if verify_spectrum is not None:
        # 0 disables the spectrum-verification probe (reference-equivalent
        # semantics: a degenerate cluster may come back incomplete)
        p = p.with_(verify_spectrum=int(verify_spectrum))
    # Preconditioner: explicit OPinv wins; else Jacobi if requested/possible.
    K = None
    if OPinv is not None:
        K = aslinearoperator(OPinv)
    elif jacobi:
        d = Aop.diagonal()
        if d is None:
            raise ValueError("jacobi=True but operator has no diagonal()")
        K = JacobiPrecond(d)

    meth = method
    if meth is None:
        meth = Method.DEFAULT_MIN_MATVECS
    elif isinstance(meth, str):
        meth = Method[meth.replace("PRIMME_", "")]
    if projection is not None:
        from .params import Projection
        if isinstance(projection, str):
            projection = Projection(projection.replace("primme_proj_", ""))
        p = p.with_(projection=projection)
    p = set_method(meth, p, has_precond=K is not None,
                   has_mass=Mop is not None)
    if maxInnerIterations is not None:
        p = p.with_(max_inner_iterations=int(maxInnerIterations))
    # reference-binding parity (primme.pyx:1446): unknown keyword
    # arguments are primme_params labels routed through the reflection
    # layer AFTER the method preset, so they override it — e.g.
    # eigsh(A, relTolBase=1.5, restarting_maxPrevRetain=3). Structural
    # labels are refused: they would silently desync the configuration
    # from the operator and the k/n validation already performed.
    for label_, val_ in primme_kwargs.items():
        if prm._canonical(label_) in ("n", "num_evals", "target",
                                      "num_ortho_const", "hermitian"):
            raise ValueError(
                f"{label_!r} cannot be set through keyword forwarding — "
                f"it is derived from the operator and the k=/which=/"
                f"lock= arguments")
        p = prm.set_member(p, label_, val_)

    v0j = None
    if v0 is not None:
        v0j = jnp.asarray(np.asarray(v0))
        if v0j.ndim == 1:
            v0j = v0j[:, None]
        if perm is not None:
            v0j = v0j[perm, :]
    oc = None
    if lock is not None:
        oc = jnp.asarray(np.asarray(lock))
        if oc.ndim == 1:
            oc = oc[:, None]
        if oc.ndim != 2 or oc.shape[0] != n:
            # `lock` is the reference binding's name for *orthogonal
            # constraint vectors* (primme.pyx:284 `lock`), not a flag —
            # hard locking is `locking=True`.
            raise ValueError(
                f"lock= must be an [n, c] array of orthogonal-constraint "
                f"vectors (n={n}); for hard locking pass locking=True. "
                f"Got shape {np.shape(lock)}")
        if perm is not None:
            oc = oc[perm, :]
        p = p.with_(num_ortho_const=int(oc.shape[1]))
        p = resolve_defaults(p)

    history: dict = {"num_matvecs": [], "num_outer": [], "num_locked": [],
                     "num_converged": [], "basis_size": [], "event": [],
                     "num_inner": [], "hvals": [], "resnorms": [],
                     "inner": []}

    # event taxonomy matches the reference's primme_event enum
    # (include/primme_eigs.h:80-89): 0 outer_iteration, 1 inner_iteration,
    # 2 restart, 3 reset, 4 converged, 5 locked
    _EV = {0: "OUT", 1: "INN", 2: "RST", 3: "RES", 4: "CNV", 5: "LCK"}

    mon = monitor
    if mon is None and printLevel >= 2:
        def mon(event, num_outer, num_matvecs, num_locked, num_converged,
                basis_size, num_inner, hvals, resnorms,
                inner_trace=None, msg=None, time=None):
            # default_monitor-style text reporting (primme_c.c:602);
            # per-inner-iteration INN lines when monitor_inner=True
            # replay the device-recorded QMR trace (inner_solve.c:491)
            if int(event) == 7:   # primme_event_profile
                print(f"PRF {msg} {float(time):.6f}s")
                return
            if inner_trace is not None and int(num_inner) > 0:
                tr = np.asarray(inner_trace)
                for i in range(min(int(num_inner), tr.shape[0])):
                    al = tr[i, :, 2] > 0
                    if not al.any():
                        continue
                    j = int(np.argmax(al))
                    print(f"INN it={int(num_outer):5d} qmr={i:3d} "
                          f"alive={int(al.sum())} "
                          f"val[0]={tr[i, j, 0]:+.10e} "
                          f"eres[0]={tr[i, j, 1]:.3e}")
            ev = _EV.get(int(event), "?")
            print(f"{ev} it={int(num_outer):5d} mv={int(num_matvecs):6d} "
                  f"lock={int(num_locked):3d} conv={int(num_converged):3d} "
                  f"b={int(basis_size):3d} inner={int(num_inner):4d} "
                  f"val[0]={float(np.asarray(hvals)[0]):+.10e} "
                  f"res[0]={float(np.asarray(resnorms)[0]):.3e}")

    if return_history and mon is None:
        def mon(event, num_outer, num_matvecs, num_locked, num_converged,
                basis_size, num_inner, hvals, resnorms,
                inner_trace=None):
            history["event"].append(int(event))
            history["num_outer"].append(int(num_outer))
            history["num_matvecs"].append(int(num_matvecs))
            history["num_locked"].append(int(num_locked))
            history["num_converged"].append(int(num_converged))
            history["basis_size"].append(int(basis_size))
            history["num_inner"].append(int(num_inner))
            history["hvals"].append(np.asarray(hvals))
            history["resnorms"].append(np.asarray(resnorms))
            if inner_trace is not None:
                tr = np.asarray(inner_trace)
                history["inner"].append(tr[:min(int(num_inner),
                                                tr.shape[0])])

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
        if Mop is not None:
            Mop = jax.tree_util.tree_map(_shard_leaf, Mop)
        if K is not None:
            K = jax.tree_util.tree_map(_shard_leaf, K)
        if v0j is not None:
            v0j = jax.device_put(v0j, shard)
        if oc is not None:
            oc = jax.device_put(oc, shard)

    _t0 = time.perf_counter()
    if dtype is not None and jnp.dtype(dtype) != jnp.dtype(Aop.dtype):
        from .operators import CastOperator
        wd = jnp.dtype(dtype)
        Aop = CastOperator(Aop, wd)
        if Mop is not None:
            Mop = CastOperator(Mop, wd)
        if K is not None:
            K = CastOperator(K, wd)

    def _run_solve(mon_=mon):
        if p.dynamic_method_switch:
            from .core.dynamic import solve_eigs_dynamic
            return solve_eigs_dynamic(
                Aop, p, B=Mop, K=K, v0=v0j, ortho_const=oc, dtype=dtype,
                has_precond=K is not None, shard=shard, monitor=mon_,
                convtest=convtest)
        inner = None
        if p.max_inner_iterations != 0:
            from .core.inner import jdqmr_inner_solve
            inner = jdqmr_inner_solve
        itcap = 0
        # printLevel >= 4 reports inner iterations like the reference
        # (default_monitor, primme_c.c:602 at primme_event_inner_iteration)
        if (monitor_inner or printLevel >= 4) and mon_ is not None \
                and inner is not None:
            # bounded on-device replay buffer; beyond-cap iterations
            # overwrite the last slot (count still exact via num_inner)
            mi = p.max_inner_iterations
            itcap = min(mi, 128) if mi > 0 else 128
        return solve_eigs(Aop, p, B=Mop, K=K, v0=v0j,
                          ortho_const=oc, inner_solve=inner, dtype=dtype,
                          monitor=mon_, shard=shard, convtest=convtest,
                          segment_outer=segment_outer,
                          inner_trace_cap=itcap)

    res: EigsResult = _run_solve()

    resnorms = np.asarray(res.resnorms)
    anorm = float(res.stats.anorm_estimate)
    eps_eff = p.eps if p.eps > 0 else 1e4 * float(
        jnp.finfo(res.evals.dtype).eps)
    if dtype is not None and jnp.dtype(dtype) in (
            jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        # half-precision basis cannot resolve residuals below storage eps
        eps_eff = max(eps_eff, 4 * float(jnp.finfo(jnp.dtype(dtype)).eps))
    unconv = int(np.sum(~(resnorms <= 10 * max(eps_eff * max(anorm, 1e-300),
                                               1e-300))))  # NaN/inf count too
    if unconv > 0 and raise_for_unconverged:
        raise PrimmeError(
            f"{unconv}/{k} pairs unconverged (resnorms={resnorms})")
    if int(res.stats.probe_exhausted) and raise_for_unconverged:
        # the probe round budget ran out before the returned set could be
        # verified complete — honest failure, not silent success (pass
        # verify_spectrum=0 to run unverified like the reference, or a
        # larger verify_spectrum round budget)
        raise PrimmeError(
            f"spectrum verification exhausted its round budget "
            f"({int(res.stats.num_probe_rounds)} rounds) before confirming "
            f"the returned set is complete; the pairs converge but may "
            f"miss degenerate-cluster members. Increase verify_spectrum "
            f"or pass verify_spectrum=0 to skip verification.")

    stats = {k_: np.asarray(v).item()
             for k_, v in res.stats._asdict().items()}
    stats["elapsed_time"] = time.perf_counter() - _t0
    # zero by construction under SPMD: the projected solve is replicated,
    # never rank-0-solved-and-broadcast (primme_stats numBroadcast)
    stats["num_broadcast"] = 0
    stats["volume_broadcast"] = 0
    if (time_breakdown and return_stats) or profile:
        # MEASURED in-solve breakdown: re-run the solve once under the XLA
        # profiler, attribute device self-times to the solver's phase
        # scopes (profiling.measure_breakdown). Falls back to the
        # representative-kernel estimate on backends whose profiler
        # exposes no per-op device stats (CPU).
        from .profiling import measure_breakdown, time_breakdown as _tb
        measured: dict = {}
        try:
            # the profiling RE-RUN must not replay the event stream into
            # the user's monitor (it would duplicate every history
            # record and monitor call)
            measured = measure_breakdown(lambda: _run_solve(None))
        except Exception:
            measured = {}
        if not measured:
            measured = _tb(Aop, K, stats, mmax=p.max_basis_size,
                           blk=p.max_block_size,
                           cwin=min(p.max_basis_size, k + p.max_block_size),
                           dtype=(dtype or Aop.dtype), n=n)
            measured["time_source"] = "estimated"
        if time_breakdown and return_stats:
            stats.update(measured)
    if profile:
        # primme.profile parity (src/include/common.h:355-398): the
        # regex selects named scopes, and every match is reported
        # through the monitor as a primme_event_profile event (enum 7,
        # include/primme_eigs.h:80-89) carrying the scope's measured
        # device self-time — plus a stats['profile'] table.
        import re as _re
        pat = _re.compile(profile)
        scope_key = {"pt_matvec": "time_matvec",
                     "pt_precond": "time_precond",
                     "pt_ortho": "time_ortho",
                     "pt_dense": "time_dense",
                     "pt_other": "time_other"}
        prof = {sc: float(measured.get(tk, 0.0))
                for sc, tk in scope_key.items() if pat.search(sc)}
        stats["profile"] = prof
        stats["time_source"] = measured.get("time_source", "measured")
        if mon is not None:
            # only deliver to monitors whose SIGNATURE accepts the
            # msg/time kwargs (primme_event_profile extension) — decided
            # by inspection, not by catching TypeError, so a TypeError
            # raised inside the monitor's body propagates instead of
            # silently dropping the remaining events
            import inspect as _inspect
            try:
                sig = _inspect.signature(mon)
                takes_kw = all(
                    kw in sig.parameters
                    or any(pp.kind is _inspect.Parameter.VAR_KEYWORD
                           for pp in sig.parameters.values())
                    for kw in ("msg", "time"))
            except (TypeError, ValueError):
                takes_kw = True   # uninspectable callable: attempt it
            if takes_kw:
                z9 = np.zeros(0)
                for name_, secs in prof.items():
                    mon(7, 0, stats.get("num_matvecs", 0), 0, 0, 0, 0,
                        z9, z9, msg=name_, time=secs)
    if return_history:
        stats["hist"] = {k_: (np.asarray(v_) if v_ and not isinstance(
            v_[0], np.ndarray) else v_) for k_, v_ in history.items()}
    out = [np.asarray(res.evals)]
    if return_eigenvectors:
        ev = np.asarray(res.evecs)
        if perm is not None:
            ev = ev[np.argsort(perm), :]
        out.append(ev)
    if return_stats:
        out.append(stats)
    return tuple(out) if len(out) > 1 else out[0]


def eigs(A: Any, k: int = 6, which: str = "LM", sigma: Optional[float] = None,
         tol: float = 0.0, ncv: Optional[int] = None,
         maxiter: Optional[int] = None, v0: Any = None,
         return_eigenvectors: bool = True, return_stats: bool = False,
         method: Optional[Any] = None, maxMatvecs: Optional[int] = None,
         OPinv: Any = None, raise_for_unconverged: bool = True,
         seed: int = 0, maxInnerIterations: Optional[int] = None,
         segment_outer: Optional[int] = None,
         locking: Optional[bool] = None, maxBlockSize: int = 0,
         lock: Any = None):
    """Eigenpairs of a *normal* (non-Hermitian, A A^H = A^H A) operator —
    complex Ritz values. The analogue of the reference's
    ``dprimme_normal``/``zprimme_normal`` entry points
    (``include/primme_eigs.h:390``, KIND(N) axis of
    ``src/eigs/template_normal.h``). ``which`` in
    {'LM','SM','LR','SR','CGT','CLT'} ('SM' is closest to ``sigma`` in
    modulus; 'CGT'/'CLT' order by REAL part >= / <= ``sigma`` — the one
    total order consistent with the Hermitian definition of these
    targets). ``lock`` passes orthogonal-constraint vectors
    (numOrthoConst), ``locking`` enables hard locking, ``maxBlockSize``
    the block width — the same axes the Hermitian surface exposes.

    GD-type corrections, or — for the JD presets (``method='JDQMR'`` etc.)
    — an inner projected block-GMRES correction solver with complex
    shifts (a capability the reference lacks: its ``inner_solve`` exists
    only for the Hermitian kind, ``src/eigs/correction.c:464``)."""
    Aop = aslinearoperator(A)
    n = Aop.shape[0]
    wmap = {"LM": Target.largest_abs, "SM": Target.closest_abs,
            "LR": Target.largest, "SR": Target.smallest,
            "CGT": Target.closest_geq, "CLT": Target.closest_leq}
    which = which.upper()
    if which not in wmap:
        raise ValueError(f"which must be one of {sorted(wmap)}")
    target = wmap[which]
    shifts = ()
    if target in (Target.closest_abs, Target.largest_abs,
                  Target.closest_geq, Target.closest_leq):
        shifts = (float(sigma) if sigma is not None else 0.0,)

    cdt = jnp.promote_types(Aop.dtype, jnp.complex64)

    p = PrimmeParams(n=n, num_evals=k, target=target, target_shifts=shifts,
                     eps=float(tol), max_basis_size=(ncv or 0),
                     max_block_size=maxBlockSize,
                     locking=(prm.UNSET if locking is None else
                              int(locking)),
                     hermitian=False, rng_seed=seed)
    if maxiter is not None:
        p = p.with_(max_outer_iterations=int(maxiter))
    if maxMatvecs is not None:
        p = p.with_(max_matvecs=int(maxMatvecs))
    K = aslinearoperator(OPinv) if OPinv is not None else None
    meth = method or Method.GD_plusK
    if isinstance(meth, str):
        meth = Method[meth.replace("PRIMME_", "")]
    p = set_method(meth, p, has_precond=K is not None)
    if maxInnerIterations is not None:
        p = p.with_(max_inner_iterations=int(maxInnerIterations))
    inner = None
    if p.max_inner_iterations != 0:
        # JD inner-outer for normal operators: the reference has no such
        # solver (``src/eigs/correction.c:464`` returns
        # FUNCTION_UNAVAILABLE for KIND(N) + maxInnerIterations > 0); the
        # TPU framework provides projected block GMRES with complex shifts.
        from .core.inner import normal_inner_solve as inner

    v0j = None
    if v0 is not None:
        v0j = jnp.asarray(np.asarray(v0), cdt)
        if v0j.ndim == 1:
            v0j = v0j[:, None]
    oc = None
    if lock is not None:
        oc = jnp.asarray(np.asarray(lock), cdt)
        if oc.ndim == 1:
            oc = oc[:, None]
        if oc.ndim != 2 or oc.shape[0] != n:
            raise ValueError(
                f"lock= must be an [n, c] array of orthogonal-constraint "
                f"vectors (n={n}); for hard locking pass locking=True")
        p = p.with_(num_ortho_const=int(oc.shape[1]))
        p = resolve_defaults(p)

    res = solve_eigs(Aop, p, K=K, v0=v0j, ortho_const=oc, dtype=cdt,
                     inner_solve=inner, segment_outer=segment_outer)

    resnorms = np.asarray(res.resnorms)
    if raise_for_unconverged:
        anorm = float(res.stats.anorm_estimate)
        eps_eff = p.eps if p.eps > 0 else 1e4 * float(
            jnp.finfo(jnp.zeros((), cdt).real.dtype).eps)
        bad = int(np.sum(resnorms > 10 * eps_eff * max(anorm, 1e-300)))
        if bad:
            raise PrimmeError(f"{bad}/{k} pairs unconverged")
    stats = {k_: np.asarray(v).item()
             for k_, v in res.stats._asdict().items()}
    out = [np.asarray(res.evals)]
    if return_eigenvectors:
        out.append(np.asarray(res.evecs))
    if return_stats:
        out.append(stats)
    return tuple(out) if len(out) > 1 else out[0]
