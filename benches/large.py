"""Large-scale single-chip demo: 128^3 Laplacian (n=2,097,152), 20 smallest
pairs, Jacobi + JDQMR_ETol, f32 (BASELINE.md north-star configuration at
the tolerance f32 supports)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from primme_tpu import (PrimmeParams, Method, set_method,
                            Stencil3DOperator, JacobiPrecond)
    from primme_tpu.core.solver import solve_eigs
    from primme_tpu.core.inner import jdqmr_inner_solve

    nx = 128
    n = nx ** 3
    A = Stencil3DOperator(nx, nx, nx, dtype=jnp.float32)
    K = JacobiPrecond(A.diagonal())
    p = PrimmeParams(n=n, num_evals=10, eps=1e-5, max_basis_size=24,
                     max_matvecs=4000, locking=0)
    p = set_method(Method.JDQMR_ETol, p, has_precond=True)
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 1)), jnp.float32)
    run = jax.jit(lambda v0: solve_eigs(A, p, K=K, v0=v0, dtype=jnp.float32,
                                        inner_solve=jdqmr_inner_solve))
    t0 = time.perf_counter()
    res = run(v0)
    jax.block_until_ready(res.evals)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    res = run(v0)
    jax.block_until_ready(res.evals)
    wall = time.perf_counter() - t0

    ax = lambda N: 2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1))
    lam = (ax(nx)[:4, None, None] + ax(nx)[None, :4, None]
           + ax(nx)[None, None, :4]).ravel()
    lam = np.sort(lam)[:10]
    evals = np.sort(np.asarray(res.evals))
    print(f"128^3 (n={n}) k=10 jacobi JDQMR_ETol f32: {wall:.3f}s "
          f"mv={int(res.stats.num_matvecs)} "
          f"max_res={float(np.asarray(res.resnorms).max()):.2e} "
          f"eval_err={np.abs(evals - lam).max():.2e}")


def main_k100():
    """BASELINE.md north-star: 128^3 Laplacian, 100 smallest pairs, Jacobi,
    block GD+k with hard locking (f32 tolerance)."""
    import jax
    import jax.numpy as jnp
    from primme_tpu import (PrimmeParams, Method, set_method,
                            Stencil3DOperator, JacobiPrecond)
    from primme_tpu.core.solver import solve_eigs

    nx = 128
    n = nx ** 3
    k = 100
    A = Stencil3DOperator(nx, nx, nx, dtype=jnp.float32)
    K = JacobiPrecond(A.diagonal())
    p = PrimmeParams(n=n, num_evals=k, eps=1e-5, max_basis_size=48,
                     max_block_size=4, max_matvecs=60000, locking=1)
    p = set_method(Method.GD_Olsen_plusK, p, has_precond=True)
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 4)),
                     jnp.float32)
    run = jax.jit(lambda v0: solve_eigs(A, p, K=K, v0=v0, dtype=jnp.float32))
    t0 = time.perf_counter()
    res = run(v0)
    jax.block_until_ready(res.evals)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    res = run(v0)
    jax.block_until_ready(res.evals)
    wall = time.perf_counter() - t0

    ax = lambda N: 2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1))
    m = 8
    lam = (ax(nx)[:m, None, None] + ax(nx)[None, :m, None]
           + ax(nx)[None, None, :m]).ravel()
    lam = np.sort(lam)[:k]
    evals = np.sort(np.asarray(res.evals))
    print(f"128^3 (n={n}) k=100 jacobi GD_Olsen_plusK lock f32: {wall:.3f}s "
          f"mv={int(res.stats.num_matvecs)} "
          f"locked={int(res.stats.num_locked)} "
          f"max_res={float(np.asarray(res.resnorms).max()):.2e} "
          f"eval_err={np.abs(evals - lam).max():.2e}")


if __name__ == "__main__":
    if "--k100" in sys.argv:
        main_k100()
    else:
        main()
