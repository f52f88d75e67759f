"""Microbenchmarks: SpMV/SpMM throughput and solver overhead on one chip."""

import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, warmup=2, iters=10):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from primme_tpu import Stencil3DOperator, ELLOperator

    dev = jax.devices()[0]
    print(f"device: {dev.platform}")

    # --- stencil SpMM ----------------------------------------------------
    for size, blk in [(64, 1), (64, 4), (64, 8), (128, 1), (128, 4)]:
        n = size ** 3
        A = Stencil3DOperator(size, size, size, dtype=jnp.float32)
        X = jnp.ones((n, blk), jnp.float32)
        f = jax.jit(A.matmat)
        dt = timeit(f, X)
        nnz = 7 * n
        # traffic: read X + write Y (+ streaming reuse of halo) ~ 2*n*blk*4B
        gbs = 2 * n * blk * 4 / dt / 1e9
        print(f"stencil {size}^3 blk={blk}: {dt*1e3:.3f} ms, "
              f"{nnz*blk/dt/1e9:.2f} Gnnz/s, ~{gbs:.0f} GB/s effective")

    # --- ELL SpMM --------------------------------------------------------
    import scipy.sparse as sp
    for n, row_nnz, blk in [(1 << 18, 8, 1), (1 << 18, 8, 8),
                            (1 << 20, 8, 4)]:
        rng = np.random.default_rng(0)
        cols = rng.integers(0, n, size=(n, row_nnz)).astype(np.int32)
        vals = rng.normal(size=(n, row_nnz)).astype(np.float32)
        A = ELLOperator(cols, vals, shape=(n, n))
        X = jnp.ones((n, blk), jnp.float32)
        f = jax.jit(A.matmat)
        dt = timeit(f, X)
        nnz = n * row_nnz
        print(f"ELL n=2^{int(np.log2(n))} w={row_nnz} blk={blk}: "
              f"{dt*1e3:.3f} ms, {nnz*blk/dt/1e9:.2f} Gnnz/s")

    # --- dense gram/bcomb (the solver's per-iteration gemms) -------------
    n, mmax = 1 << 20, 24
    V = jnp.ones((n, mmax), jnp.float32)
    Y = jnp.ones((n, 1), jnp.float32)
    g = jax.jit(lambda V, Y: jnp.matmul(
        V.T, Y, precision=jax.lax.Precision.HIGHEST))
    dt = timeit(g, V, Y)
    print(f"gram [2^20 x {mmax}]^T [2^20 x 1] HIGHEST: {dt*1e3:.3f} ms "
          f"({2*n*mmax*4/dt/1e9:.0f} GB/s)")
    gb = jax.jit(lambda V, Y: jnp.matmul(
        V.T, Y, precision=jax.lax.Precision.DEFAULT))
    dt = timeit(gb, V, Y)
    print(f"gram DEFAULT: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
