"""Mixed-precision refinement (primme_tpu.refine): f32 solve + f64
polish to tolerances below f32 resolution (the BASELINE.md 1e-10
north-star path)."""

import numpy as np
import pytest
import scipy.sparse as sp

from primme_tpu import eigsh, ChebyshevPrecond, Stencil3DOperator
from primme_tpu.refine import refine_eigsh


def test_refine_tridiag_to_1e12():
    n = 1000
    d = np.linspace(1, 100, n)
    A = sp.diags([d, 0.3 * np.ones(n - 1), 0.3 * np.ones(n - 1)],
                 [0, 1, -1]).tocsr()
    vals, vecs = eigsh(A, k=5, which="SA", tol=1e-5, dtype=np.float32,
                       raise_for_unconverged=False)
    ev, X, st = refine_eigsh(A, vecs, tol=1e-12, return_stats=True)
    ref = np.sort(np.linalg.eigvalsh(A.toarray()))[:5]
    assert np.abs(ev - ref).max() < 1e-10
    R = A @ X - X * ev[None, :]
    assert np.linalg.norm(R, axis=0).max() <= 1e-11 * st["anorm_estimate"] \
        * 10


def test_refine_laplacian_cheb_1e11():
    import jax.numpy as jnp

    nx = 16
    n = nx ** 3
    A = Stencil3DOperator(nx, nx, nx, dtype=jnp.float32)
    vals, vecs = eigsh(A, k=6, which="SA", tol=1e-5, raise_for_unconverged=False)
    A64 = Stencil3DOperator(nx, nx, nx, dtype=jnp.float64)
    K = ChebyshevPrecond.from_operator(A64, degree=8)
    ev, X, st = refine_eigsh(A64, vecs, tol=1e-11, OPinv=K,
                             return_stats=True)
    ax = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
    lam = np.sort((ax[:3, None, None] + ax[None, :3, None]
                   + ax[None, None, :3]).ravel())[:6]
    assert np.abs(ev - lam).max() < 1e-12
    assert st["resnorms"].max() <= 1e-11 * st["anorm_estimate"]
    # preconditioned refinement converges in a short tail
    assert st["num_refine_iters"] < 100


def test_refine_largest():
    n = 500
    rng = np.random.default_rng(1)
    A = rng.normal(size=(n, n))
    A = (A + A.T) / 2
    ref = np.sort(np.linalg.eigvalsh(A))
    vals, vecs = eigsh(A, k=4, which="LA", tol=1e-4, dtype=np.float32,
                       raise_for_unconverged=False)
    ev, X = refine_eigsh(A, vecs, tol=1e-12, which="LA")
    assert np.abs(np.sort(ev) - ref[-4:]).max() < 1e-10
