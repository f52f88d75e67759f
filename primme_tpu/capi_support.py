"""Support layer for the embedded-Python C/Fortran API (``native/capi.cpp``).

The reference is a C library first — ``dprimme``/``dprimme_svds``
(``include/primme_eigs.h:382-477``) plus an F77 shim
(``src/eigs/primme_f77.c``) — so C and Fortran codes can call it
directly. This framework's solver is Python/JAX; the native shim
(``native/capi.cpp``) embeds CPython and forwards into this module,
giving C/Fortran programs the same capability: hand over a CSR matrix
(the test drivers' native format, ``tests/COMMON/csr.c``) or a matvec
callback (the library's own ``matrixMatvec`` contract) and receive
eigenpairs / singular triplets.

All buffer arguments arrive as raw addresses (int); vectors are written
back column-major (Fortran order), matching the reference's ``evecs``
layout. Every function returns 0 on success, -1 on error with the
message retrievable via :func:`last_error`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

# The C API is a double-precision surface (the ``dprimme`` analogue):
# make f64 real before the first trace. Harmless if already set.
import jax

jax.config.update("jax_enable_x64", True)
# Pin the platform authoritatively: TPU plugins (axon) override the
# JAX_PLATFORMS environment variable, so the env var the embedding C
# program sets cannot be trusted — only the config update is (the same
# failure mode tests/conftest.py documents). Default cpu: this surface
# is f64 (TPU f64 matmuls are only ~5e-6 accurate) and the matvec
# callback mode needs host callbacks, which TPU backends may not
# support. Override with PTPU_PLATFORM=tpu for CSR workloads that want
# the accelerator.
jax.config.update("jax_platforms", os.environ.get("PTPU_PLATFORM", "cpu"))

_last_error = ""


def last_error() -> str:
    return _last_error


def _set_error(e: BaseException) -> int:
    global _last_error
    _last_error = f"{type(e).__name__}: {e}"
    return -1


def _arr(addr: int, ctype, count: int) -> np.ndarray:
    """View ``count`` elements of C type ``ctype`` at address ``addr``."""
    return np.ctypeslib.as_array(ctypes.cast(int(addr),
                                             ctypes.POINTER(ctype)),
                                 shape=(int(count),))


def _csr(n_rows: int, n_cols: int, nnz: int, indptr: int, indices: int,
         data: int):
    import scipy.sparse as sp
    ip = _arr(indptr, ctypes.c_int64, n_rows + 1).copy()
    ix = _arr(indices, ctypes.c_int64, nnz).copy()
    dv = _arr(data, ctypes.c_double, nnz).copy()
    return sp.csr_matrix((dv, ix.astype(np.int64), ip.astype(np.int64)),
                         shape=(n_rows, n_cols))


_WHICH_EIG = {0: "SA", 1: "LA", 2: "CGT", 3: "CLT", 4: "SM", 5: "LM"}


def _which_str(which) -> str:
    """Accept a string or the F77 shim's integer code
    (0 smallest, 1 largest, 2 closest_geq, 3 closest_leq,
    4 closest_abs, 5 largest_abs — the ``primme_target`` enum order,
    ``include/primme_eigs.h:47-54``; also the order this module's
    ``constant_info`` reports, so a value read back via
    ``params_get("target")`` feeds straight into the F77 surface)."""
    if isinstance(which, (int, np.integer)):
        return _WHICH_EIG[int(which)]
    return str(which)


def eigsh_csr(n: int, nnz: int, indptr: int, indices: int, data: int,
              k: int, which, tol: float, method: str, sigma: float,
              evals: int, evecs: int, resnorms: int) -> int:
    """Solve the Hermitian eigenproblem for a CSR matrix passed by
    address; write evals [k], evecs [n*k] column-major, resnorms [k]."""
    try:
        from . import eigsh

        A = _csr(n, n, nnz, indptr, indices, data)
        kw = {}
        if method:
            kw["method"] = method
        w = _which_str(which)
        if w in ("SM", "CGT", "CLT", "LM"):
            # LM (largest_abs) also takes a shift: farthest FROM sigma
            # (the reference pairs primme_largest_abs with targetShifts)
            kw["sigma"] = float(sigma)
        ev, X = eigsh(A, k=k, which=w, tol=float(tol),
                      raise_for_unconverged=False, **kw)
        R = A @ X - X * ev[None, :]
        _arr(evals, ctypes.c_double, k)[:] = ev
        _arr(evecs, ctypes.c_double, n * k)[:] = np.asarray(
            X, np.float64).reshape(-1, order="F")
        _arr(resnorms, ctypes.c_double, k)[:] = np.linalg.norm(R, axis=0)
        return 0
    except Exception as e:  # noqa: BLE001 — boundary: report via last_error
        return _set_error(e)


# void matvec(const double *x, double *y, int blockSize, void *ctx)
# x, y: [n, blockSize] column-major — the reference's matrixMatvec
# contract (include/primme_eigs.h:170) restricted to f64/ld=n.
_MATVEC_T = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int, ctypes.c_void_p)


def _callback_operator(n: int, fnaddr: int, ctx: int):
    """Build an operator around a C matvec function pointer. Each
    application leaves the device via ``jax.pure_callback`` — the same
    host boundary the reference crosses for every user matvec."""
    import jax
    import jax.numpy as jnp
    from .operators import FunctionOperator

    if jax.default_backend() not in ("cpu",):
        # pure_callback needs host send/recv, which accelerator backends
        # (axon TPU) may not implement — fail with a clear message
        # instead of an opaque UNIMPLEMENTED from the runtime.
        raise RuntimeError(
            f"the matvec-callback mode requires host callbacks, "
            f"unsupported on the '{jax.default_backend()}' backend; "
            f"run with PTPU_PLATFORM=cpu (default) or use the CSR entry "
            f"points")

    fn = _MATVEC_T(int(fnaddr))
    ctxp = ctypes.c_void_p(int(ctx) or None)

    def _host(Xh: np.ndarray) -> np.ndarray:
        Xf = np.asfortranarray(np.asarray(Xh, np.float64))
        Y = np.zeros_like(Xf, order="F")
        fn(Xf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
           Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
           int(Xf.shape[1]), ctxp)
        return Y

    def matmat(X):
        return jax.pure_callback(
            _host, jax.ShapeDtypeStruct(X.shape, X.dtype), X,
            vmap_method="sequential")

    return FunctionOperator(matmat, (n, n), jnp.float64)


def eigsh_matvec(n: int, fnaddr: int, ctx: int, k: int, which,
                 tol: float, method: str, sigma: float, maxiter: int,
                 evals: int, evecs: int, resnorms: int) -> int:
    """Solve with a user C matvec callback (``matrixMatvec`` contract)."""
    try:
        from . import eigsh

        A = _callback_operator(n, fnaddr, ctx)
        kw = {}
        if method:
            kw["method"] = method
        if maxiter > 0:
            kw["maxMatvecs"] = int(maxiter)
        w = _which_str(which)
        if w in ("SM", "CGT", "CLT", "LM"):
            # LM (largest_abs) also takes a shift: farthest FROM sigma
            # (the reference pairs primme_largest_abs with targetShifts)
            kw["sigma"] = float(sigma)
        ev, X, st = eigsh(A, k=k, which=w, tol=float(tol),
                          return_stats=True, raise_for_unconverged=False,
                          **kw)
        X = np.asarray(X, np.float64)
        # true residuals through the user's own matvec
        AX = np.zeros_like(X, order="F")
        _MATVEC_T(int(fnaddr))(
            np.asfortranarray(X).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            AX.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(X.shape[1]), ctypes.c_void_p(int(ctx) or None))
        R = AX - X * ev[None, :]
        _arr(evals, ctypes.c_double, k)[:] = ev
        _arr(evecs, ctypes.c_double, n * k)[:] = X.reshape(-1, order="F")
        _arr(resnorms, ctypes.c_double, k)[:] = np.linalg.norm(R, axis=0)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


# ---------------------------------------------------------------------------
# Parameter-object surface: the C-ABI analogue of primme_params_create /
# primme_set_method / primme_set_member / primme_free
# (include/primme_eigs.h:461-477). A handle owns a PrimmeParams evolved
# in call order over the Python reflection layer (params.set_member),
# so — like the reference — a member set AFTER set_method overrides the
# preset and the full configuration space (method presets, block sizes,
# interior targets with multiple shifts, projections, locking, ...) is
# reachable from C and Fortran by string label.
# ---------------------------------------------------------------------------

_PARAMS: dict = {}
_NEXT_HANDLE = [1]


def params_create() -> int:
    """New parameter handle (> 0). Set ``numEvals``/``target``/... by
    label; ``n`` may be set by label or comes from the matrix at run
    time. Calls are REPLAYED against the true problem size when the
    solve runs, so method presets resolve for the real ``n`` (applying
    them eagerly against a placeholder would clamp basis sizes to it)
    while preserving the reference's ordering semantics: a member set
    after ``set_method`` overrides the preset."""
    h = _NEXT_HANDLE[0]
    _NEXT_HANDLE[0] += 1
    _PARAMS[h] = {"ops": [], "jacobi": False, "n": 0}
    return h


def params_free(h: int) -> int:
    if _PARAMS.pop(int(h), None) is None:
        global _last_error
        _last_error = f"unknown params handle {h}"
        return -1
    return 0


def _params_build(st, n: int):
    """Replay the recorded call sequence on a fresh PrimmeParams sized
    for the actual problem."""
    from .params import PrimmeParams, Method, set_member, set_method

    p = PrimmeParams(n=max(int(n), 1))
    for op, a in st["ops"]:
        if op == "set":
            p = set_member(p, a[0], a[1])
        else:
            p = set_method(Method[a.replace("PRIMME_", "")], p,
                           has_precond=st["jacobi"])
    return p


def params_set(h: int, label: str, value: str) -> int:
    """Set a member by reference label (``maxBlockSize``,
    ``correction.maxInnerIterations``, ``targetShifts`` = space/comma
    list, ...). Extra labels beyond the reference surface: ``n`` (the
    problem size, validated against the matrix at run time) and
    ``jacobi`` (0/1 — request the built-in Jacobi preconditioner)."""
    try:
        st = _PARAMS[int(h)]
        if label == "jacobi":
            st["jacobi"] = bool(int(value))
            return 0
        if label == "n":
            st["n"] = int(value)
            return 0
        from .params import PrimmeParams, set_member

        # validate the label/value NOW (the reference's set_member
        # errors at call time, not at dprimme time)
        set_member(PrimmeParams(n=max(st["n"], 1)), label, value)
        st["ops"].append(("set", (label, value)))
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def params_set_method(h: int, name: str) -> int:
    """Apply a method preset (``primme_set_method`` analogue); accepts
    reference constant names with or without the PRIMME_ prefix."""
    try:
        st = _PARAMS[int(h)]
        from .params import Method

        Method[str(name).replace("PRIMME_", "")]  # validate now
        st["ops"].append(("method", str(name)))
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def params_get(h: int, label: str, out: int) -> int:
    """Read a member as a double (``primme_get_member`` restricted to
    the numeric surface); enum members return their reference constant
    (``primme_constant_info`` value)."""
    try:
        st = _PARAMS[int(h)]
        from .params import get_member, constant_info
        import enum as _enum

        if label == "n":
            # report the stored value (0 = unset, like the reference's
            # struct default) — never the internal replay placeholder
            _arr(out, ctypes.c_double, 1)[0] = float(st["n"])
            return 0
        # when n is not yet known, replay against a LARGE placeholder so
        # size clamps (maxBasisSize = min(n, ...) inside set_method /
        # resolve) don't report n=1-clamped garbage; the run path always
        # replays at the true matrix size
        v = get_member(_params_build(st, st["n"] or (1 << 30)), label)
        if isinstance(v, _enum.Enum):
            val = None
            for pref in ("primme_", "primme_proj_", "primme_init_"):
                try:
                    val = constant_info(pref + str(v.value))
                    break
                except KeyError:
                    continue
            if val is None:
                raise KeyError(f"no constant for {v!r}")
            v = val
        elif isinstance(v, tuple):
            v = v[0] if v else 0.0
        _arr(out, ctypes.c_double, 1)[0] = float(v)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def params_display(h: int) -> int:
    """Print the configuration (``primme_display_params``)."""
    try:
        st = _PARAMS[int(h)]
        from .params import display_params

        print(display_params(_params_build(st, st["n"] or (1 << 30))))
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def eigsh_run(h: int, n: int, nnz: int, indptr: int, indices: int,
              data: int, evals: int, evecs: int, resnorms: int) -> int:
    """Generic parameterized solve (the ``dprimme(evals, evecs,
    resnorms, params)`` analogue): run the stored configuration against
    a CSR matrix; writes evals/resnorms [numEvals] and evecs
    [n*numEvals] column-major."""
    try:
        st = _PARAMS[int(h)]
        from .core.solver import solve_eigs
        from .operators import aslinearoperator, JacobiPrecond

        A = _csr(n, n, nnz, indptr, indices, data)
        Aop = aslinearoperator(A)
        K = JacobiPrecond(Aop.diagonal()) if st["jacobi"] else None
        from .params import resolve_defaults

        if st["n"] and int(st["n"]) != int(n):
            raise ValueError(
                f"params n={st['n']} does not match matrix n={n}")
        # resolve before reading max_inner_iterations (it may still be
        # the UNSET sentinel when no method preset was applied);
        # resolve_defaults is idempotent, solve_eigs re-runs it freely
        p = resolve_defaults(_params_build(st, int(n)))
        if p.dynamic_method_switch:
            # PRIMME_DYNAMIC through the handle surface gets the same
            # measured GD+k <-> JDQMR switching the Python API delivers
            from .core.dynamic import solve_eigs_dynamic

            res = solve_eigs_dynamic(Aop, p, K=K,
                                     has_precond=K is not None)
        else:
            inner = None
            if p.max_inner_iterations != 0:
                from .core.inner import jdqmr_inner_solve

                inner = jdqmr_inner_solve
            res = solve_eigs(Aop, p, K=K, inner_solve=inner)
        k = p.num_evals
        ev = np.asarray(res.evals, np.float64)
        X = np.asarray(res.evecs, np.float64)
        _arr(evals, ctypes.c_double, k)[:] = ev
        _arr(evecs, ctypes.c_double, n * k)[:] = X.reshape(-1, order="F")
        _arr(resnorms, ctypes.c_double, k)[:] = np.asarray(
            res.resnorms, np.float64)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


# ---------------------------------------------------------------------------
# svds parameter-object surface: the primme_svds_params_create /
# primme_svds_set_method / primme_svds_set_member analogue
# (include/primme_svds.h) over the Python svds reflection layer
# (SvdsParams + svds_set_member, including the embedded primme.* /
# primmeStage2.* stage labels).
# ---------------------------------------------------------------------------

_SVDS_PARAMS: dict = {}


def svds_params_create() -> int:
    try:
        from .svds import SvdsParams

        h = _NEXT_HANDLE[0]
        _NEXT_HANDLE[0] += 1
        _SVDS_PARAMS[h] = {"sp": SvdsParams(), "m1": ""}
        return h
    except Exception as e:  # noqa: BLE001
        _set_error(e)
        return -1


def svds_params_free(h: int) -> int:
    if _SVDS_PARAMS.pop(int(h), None) is None:
        global _last_error
        _last_error = f"unknown svds params handle {h}"
        return -1
    return 0


def svds_params_set(h: int, label: str, value: str) -> int:
    """Set an svds member by reference label (``numSvals``, ``eps``,
    ``target`` = primme_svds_largest/smallest/closest_abs or its int
    code, and embedded ``primme.*`` / ``primmeStage2.*`` stage labels).
    SvdsParams carries no problem-size-derived resolution, so calls
    apply eagerly (validation at call time like the reference)."""
    try:
        from .svds import svds_set_member

        st = _SVDS_PARAMS[int(h)]
        st["sp"] = svds_set_member(st["sp"], label, value)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def svds_params_set_method(h: int, method: str, m1: str, m2: str) -> int:
    """``primme_svds_set_method(method, methodStage1, methodStage2)``
    analogue; empty strings keep the per-method defaults."""
    try:
        from .svds import svds_set_member
        from .params import Method

        st = _SVDS_PARAMS[int(h)]
        # build the new configuration on locals and commit only after
        # every argument validated — a failed call must leave the handle
        # untouched (the reference's set-call atomicity)
        sp, m1_new = st["sp"], st["m1"]
        if method:
            # reference ordering semantics (primme_svds_set_method
            # resets the embedded stage configs before applying the
            # preset): stage members set BEFORE the method call are
            # cleared, members set AFTER it override the preset — same
            # contract the eigsh handle surface keeps via ops replay
            sp = svds_set_member(sp.with_(primme={}, primme_stage2={}),
                                 "method", method)
            m1_new = ""
        if m2:
            sp = svds_set_member(sp, "methodStage2", m2)
        if m1:
            Method[str(m1).replace("PRIMME_", "")]  # validate now
            m1_new = str(m1)
        st["sp"], st["m1"] = sp, m1_new
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def svds_params_get(h: int, label: str, out: int) -> int:
    try:
        from .svds import (svds_get_member, _SVDS_TARGETS,
                           _SVDS_METHODS)

        v = svds_get_member(_SVDS_PARAMS[int(h)]["sp"], label)
        if isinstance(v, tuple):
            v = v[0] if v else 0.0
        import enum as _enum
        if isinstance(v, _enum.Enum):
            # embedded stage labels (primme.projection, primme.target,
            # ...) store the eigs reflection's enum objects — round-trip
            # them as reference constant codes like params_get does
            from .params import constant_info

            cval = None
            for pref in ("primme_", "primme_proj_", "primme_init_"):
                try:
                    cval = constant_info(pref + str(v.value))
                    break
                except KeyError:
                    continue
            if cval is None:
                raise KeyError(f"no constant for {v!r}")
            v = cval
        if isinstance(v, str):
            # enum-valued string members round-trip as their reference
            # constant codes (primme_svds_get_member returns the enum
            # integer for these)
            from .params import Method

            if v in _SVDS_TARGETS:
                v = _SVDS_TARGETS.index(v)
            elif v in _SVDS_METHODS:
                v = _SVDS_METHODS.index(v)
            elif v in Method.__members__:
                # method_stage2 holds an EIGENSOLVER preset; return its
                # primme_preset_method code
                v = list(Method.__members__).index(v)
            elif v == "":
                v = -1.0   # unset method_stage2
            else:
                raise TypeError(
                    f"{label} is a string member ({v!r}); the numeric "
                    f"get surface cannot return it")
        _arr(out, ctypes.c_double, 1)[0] = float(v)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def svds_run(h: int, m: int, n: int, nnz: int, indptr: int, indices: int,
             data: int, svals: int, u: int, v: int, resnorms: int) -> int:
    """Parameterized svds solve over a CSR matrix (the
    ``dprimme_svds(svals, svecs, resNorms, params)`` call shape):
    writes svals/resnorms [numSvals], U [m*k] and V [n*k] column-major."""
    try:
        from .svds import svds_from_params

        st = _SVDS_PARAMS[int(h)]
        sp_ = st["sp"]
        if (sp_.m and int(sp_.m) != int(m)) or \
                (sp_.n and int(sp_.n) != int(n)):
            raise ValueError(
                f"params m={sp_.m} n={sp_.n} do not match the matrix "
                f"{m}x{n}")
        extra = {"return_stats": True, "raise_for_unconverged": False}
        if st["m1"]:
            extra["methodStage1"] = st["m1"]
        A = _csr(m, n, nnz, indptr, indices, data)
        U, s, Vt, stats = svds_from_params(A, st["sp"], **extra)
        k = st["sp"].num_svals
        _arr(svals, ctypes.c_double, k)[:] = s
        _arr(u, ctypes.c_double, m * k)[:] = np.asarray(
            U, np.float64).reshape(-1, order="F")
        _arr(v, ctypes.c_double, n * k)[:] = np.asarray(
            Vt.conj().T, np.float64).reshape(-1, order="F")
        _arr(resnorms, ctypes.c_double, k)[:] = np.asarray(
            stats["resnorms"], np.float64)
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)


def svds_csr(m: int, n: int, nnz: int, indptr: int, indices: int,
             data: int, k: int, which, tol: float,
             svals: int, u: int, v: int) -> int:
    """Singular triplets of a CSR matrix; writes svals [k],
    U [m*k] and V [n*k] column-major (``dprimme_svds`` analogue)."""
    try:
        from . import svds

        A = _csr(m, n, nnz, indptr, indices, data)
        w = which if isinstance(which, str) else (
            "LM" if int(which) else "SM")
        U, s, Vt = svds(A, k=k, tol=float(tol), which=w)
        _arr(svals, ctypes.c_double, k)[:] = s
        _arr(u, ctypes.c_double, m * k)[:] = np.asarray(
            U, np.float64).reshape(-1, order="F")
        _arr(v, ctypes.c_double, n * k)[:] = np.asarray(
            Vt.T, np.float64).reshape(-1, order="F")
        return 0
    except Exception as e:  # noqa: BLE001
        return _set_error(e)
