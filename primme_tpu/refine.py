"""Mixed-precision eigenpair refinement: f32 solve + f64 polish.

The TPU-native route to tolerances below f32 resolution (the BASELINE.md
north-star: 128^3 Laplacian to TRUE residual 1e-10): run the full solver
in f32 (MXU speed), then refine the returned block in float64 with a
host-driven LOBPCG-type iteration — each step is one jitted program of
dense f64 ops (matvec, Gram, small eigh), which XLA emulates exactly on
TPU. This mirrors the reference's multi-precision design
(``internalPrecision`` + ``Num_matrix_astype``,
``src/linalg/auxiliary.c:79``): iterate cheap, finish accurate.

The refinement is a locally optimal block preconditioned CG (LOBPCG) on
the Rayleigh quotient over span[X, K R, P]: linear convergence at the
preconditioned-gap rate from an X that is already f32-accurate, so the
f64 phase is a short tail (tens of iterations), not a solve.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import numpy as np


def refine_eigsh(A: Any, X0: Any, *, tol: float, OPinv: Any = None,
                 which: str = "SA", maxiter: int = 300, aNorm: float = 0.0,
                 device: str = "auto", return_stats: bool = False,
                 progress: int = 0):
    """Refine approximate eigenpairs of Hermitian ``A`` to ``tol * ||A||``
    in float64.

    ``X0``: [n, k] approximate eigenvectors (any precision — e.g. the
    output of an f32 :func:`~primme_tpu.api.eigsh` run). Returns
    ``(evals, evecs)`` (+ ``stats`` dict) with true f64 residual norms
    ``<= tol * ||A||`` for every pair (or the best achieved at
    ``maxiter``).

    ``device``: ``"auto"`` routes the f64 phase to the host CPU when the
    default backend is a TPU — TPU matmuls have no f64 datapath (measured:
    an f64 Gram on-chip is only ~5e-6 accurate even at Precision.HIGHEST,
    an f32-level floor that both caps the reachable residual at ~1e-7
    and eventually feeds NaN into the Cholesky), while the host does true
    f64. This split IS the intended architecture: MXU for the f32 solve,
    host float64 for the short polish tail — the TPU shape of the
    reference's CPU-resident "HSCALAR" small-dense policy
    (``src/include/template.h:80-102``).
    """
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        raise RuntimeError("refine_eigsh needs jax_enable_x64 "
                           "(jax.config.update('jax_enable_x64', True))")
    if device == "auto":
        device = ("cpu" if jax.devices()[0].platform == "tpu" else None)
    if device is not None and device != "":
        dev = jax.devices(device)[0]
        import contextlib
        ctx = jax.default_device(dev)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        return _refine_impl(A, X0, tol=tol, OPinv=OPinv, which=which,
                            maxiter=maxiter, aNorm=aNorm,
                            return_stats=return_stats, progress=progress)


def _refine_impl(A, X0, *, tol, OPinv, which, maxiter, aNorm,
                 return_stats, progress=0):
    import jax
    import jax.numpy as jnp

    from .operators import aslinearoperator, apply_precond, CastOperator

    Aop = aslinearoperator(A)
    if jnp.dtype(Aop.dtype) != jnp.dtype(jnp.float64):
        Aop = CastOperator(Aop, jnp.float64)
    K = aslinearoperator(OPinv) if OPinv is not None else None
    if K is not None and jnp.dtype(K.dtype) != jnp.dtype(jnp.float64):
        K = CastOperator(K, jnp.float64)
    X = jnp.asarray(np.asarray(X0), jnp.float64)
    n, k = X.shape
    sgn = 1.0 if which.upper() in ("SA", "SM") else -1.0

    def _orth(S):
        """Two-pass CholeskyQR; collapsed columns (e.g. the zero P block
        of the first iteration) stay exactly zero. Returns (S, live)."""
        nrm2 = jnp.sum(S * S, axis=0)
        S = S * jnp.where(nrm2 > 1e-20,
                          1.0 / jnp.sqrt(jnp.maximum(nrm2, 1e-300)),
                          0.0)[None, :]
        for _ in range(2):
            G = S.T @ S
            dead = jnp.diagonal(G) < 1e-8
            G = 0.5 * (G + G.T) + jnp.diag(
                jnp.where(dead, 1.0, 1e-14 * jnp.ones(S.shape[1])))
            L = jnp.linalg.cholesky(G)
            Li = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(S.shape[1], dtype=S.dtype), lower=True)
            S = S @ Li.T
            S = S * (~dead).astype(S.dtype)[None, :]
        live = jnp.sum(S * S, axis=0) > 0.25
        return S * live.astype(S.dtype)[None, :], live

    @jax.jit
    def step(X, P):
        AX = Aop.matmat(X)
        H = X.T @ AX
        lam = jnp.diagonal(H)
        R = AX - X @ H          # full block residual (X not yet RR-aligned)
        W = apply_precond(K, R, lam) if K is not None else R
        # normalize the residual directions: their magnitude is the
        # (tiny) residual scale, far below _orth's dead-column floor
        wn = jnp.linalg.norm(W, axis=0)
        W = jnp.where(wn > 1e-300, W / jnp.maximum(wn, 1e-300)[None, :], 0.0)
        S, live = _orth(jnp.concatenate([X, W, P], axis=1))
        AS = Aop.matmat(S)
        Hs = S.T @ AS
        Hs = 0.5 * (Hs + Hs.T)
        # dead columns get a decoupled sentinel ramp just above the live
        # spectrum (in the sign-flipped ordering space) — a huge constant
        # would poison the f64 eigh through rounding in the reduction
        scale = 2.0 * jnp.max(jnp.abs(Hs)) + 1.0
        ramp = (1.0 + jnp.arange(Hs.shape[0], dtype=Hs.dtype)) * scale
        Hs = sgn * Hs + jnp.diag(jnp.where(live, 0.0, ramp))
        w, Y = jnp.linalg.eigh(Hs)
        Y = Y[:, :k]
        X2 = S @ Y
        lam2 = sgn * w[:k]
        # LOBPCG implicit P: the part of the new X outside the old X block
        Yp = Y.at[:k, :].set(0.0)
        P2 = S @ Yp
        pn = jnp.linalg.norm(P2, axis=0)
        P2 = jnp.where(pn > 1e-14, P2 / jnp.maximum(pn, 1e-300)[None, :],
                       0.0)
        R2 = Aop.matmat(X2) - X2 * lam2[None, :]
        res = jnp.linalg.norm(R2, axis=0)
        return X2, P2, lam2, res

    P = jnp.zeros_like(X)
    X, _ = jax.jit(_orth)(X)
    anorm = float(aNorm)
    if anorm <= 0:
        # ||A|| estimate by a few f64 power iterations (the convergence
        # test needs the TOP of the spectrum, which the refined —
        # typically smallest — block does not contain)
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (n, 1), jnp.float64)

        @jax.jit
        def pw(v):
            w = Aop.matmat(v)
            return w / jnp.linalg.norm(w), jnp.linalg.norm(w)

        nrm = 0.0
        for _ in range(12):
            v, nv = pw(v)
            nrm = float(nv)
        anorm = nrm
    lam = None
    res = None
    it = 0
    for it in range(1, maxiter + 1):
        X, P, lam, res = step(X, P)
        anorm = max(anorm, float(jnp.max(jnp.abs(lam))))
        mres = float(jnp.max(res))
        if progress and it % progress == 0:
            print(f"  refine it={it} max_res/||A||={mres / anorm:.2e}",
                  flush=True)
        if mres <= tol * anorm:
            break
    order = np.argsort(sgn * np.asarray(lam))
    evals = np.asarray(lam)[order]
    evecs = np.asarray(X)[:, order]
    out = (evals, evecs)
    if return_stats:
        out = out + ({"num_refine_iters": it,
                      "resnorms": np.asarray(res)[order],
                      "anorm_estimate": anorm},)
    return out
