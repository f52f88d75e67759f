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
    hard locking (f32 tolerance). JDQMR_ETol by default (the reference's
    min-time method); the solve is host-segmented so no single device
    program runs for minutes (the remote runtime imposes an execution
    deadline — see solve_eigs(segment_outer=...))."""
    import jax
    import jax.numpy as jnp
    from primme_tpu import (PrimmeParams, Method, set_method,
                            Stencil3DOperator, JacobiPrecond)
    from primme_tpu.core.solver import solve_eigs
    from primme_tpu.core.inner import jdqmr_inner_solve

    nx = 128
    n = nx ** 3
    k = 100
    mbs = int(os.environ.get("K100_MBS", "64"))
    blk = int(os.environ.get("K100_BLK", "4"))
    meth = os.environ.get("K100_METHOD", "JDQMR_ETol")
    seg = int(os.environ.get("K100_SEG", "150"))
    prec = os.environ.get("K100_PRECOND", "jacobi")
    A = Stencil3DOperator(nx, nx, nx, dtype=jnp.float32)
    if prec.startswith("cheb"):
        # cheb8 halves the wall vs jacobi (13.9s vs 28.8s measured) at
        # exact cluster recovery; degree 16 is marginally faster but
        # misses a member of the 6-fold degenerate cluster at the cut
        from primme_tpu import ChebyshevPrecond
        K = ChebyshevPrecond.from_operator(
            A, degree=int(prec[4:] or "8"))
    else:
        K = JacobiPrecond(A.diagonal())
    p = PrimmeParams(n=n, num_evals=k, eps=1e-5, max_basis_size=mbs,
                     max_block_size=blk, max_matvecs=120000, locking=1)
    p = set_method(getattr(Method, meth), p, has_precond=True)
    inner = jdqmr_inner_solve if "JDQMR" in meth or "RQI" in meth else None
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, blk)),
                     jnp.float32)

    def run():
        return solve_eigs(A, p, K=K, v0=v0, dtype=jnp.float32,
                          inner_solve=inner, segment_outer=seg)

    t0 = time.perf_counter()
    res = run()
    jax.block_until_ready(res.evals)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    res = run()
    jax.block_until_ready(res.evals)
    wall = time.perf_counter() - t0

    ax = lambda N: 2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1))
    m = 8
    lam = (ax(nx)[:m, None, None] + ax(nx)[None, :m, None]
           + ax(nx)[None, None, :m]).ravel()
    lam = np.sort(lam)[:k]
    evals = np.sort(np.asarray(res.evals))
    print(f"128^3 (n={n}) k=100 mbs={mbs} blk={blk} {prec} {meth} lock f32: "
          f"{wall:.3f}s mv={int(res.stats.num_matvecs)} "
          f"locked={int(res.stats.num_locked)} "
          f"max_res={float(np.asarray(res.resnorms).max()):.2e} "
          f"eval_err={np.abs(evals - lam).max():.2e}")


if __name__ == "__main__":
    if "--k100" in sys.argv:
        main_k100()
    else:
        main()
