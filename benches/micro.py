"""Microbenchmarks: SpMV/SpMM throughput and solver gemm overhead on one
chip. All operands are generated on-device (host->device transfers over
the axon tunnel would otherwise dominate)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, warmup=1, iters=5):
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
    from primme_tpu import Stencil3DOperator, ELLOperator, BandedOperator

    print(f"device: {jax.devices()[0].platform}", flush=True)
    key = jax.random.key(0)

    # --- stencil SpMM ----------------------------------------------------
    for size, blk in [(64, 1), (64, 8), (128, 4)]:
        n = size ** 3
        A = Stencil3DOperator(size, size, size, dtype=jnp.float32)
        X = jax.jit(lambda: jnp.ones((n, blk), jnp.float32))()
        dt = timeit(jax.jit(A.matmat), X)
        nnz = 7 * n
        gbs = 2 * n * blk * 4 / dt / 1e9
        print(f"stencil {size}^3 blk={blk}: {dt*1e3:.3f} ms, "
              f"{nnz*blk/dt/1e9:.2f} Gnnz/s, ~{gbs:.0f} GB/s eff",
              flush=True)

    # --- banded (DIA) SpMM ----------------------------------------------
    for n, nb, blk in [(1 << 20, 7, 4)]:
        offs = (0, 1, -1, 64, -64, 4096, -4096)
        vals = jax.jit(lambda k: jax.random.normal(
            k, (nb, n), jnp.float32))(key)
        A = BandedOperator(offs, vals)
        X = jnp.ones((n, blk), jnp.float32)
        dt = timeit(jax.jit(A.matmat), X)
        print(f"banded n=2^20 B={nb} blk={blk}: {dt*1e3:.3f} ms, "
              f"{n*nb*blk/dt/1e9:.2f} Gnnz/s", flush=True)

    # --- ELL SpMM (gather path) -----------------------------------------
    for n, w, blk in [(1 << 18, 8, 4)]:
        cols = jax.jit(lambda k: jax.random.randint(
            k, (n, w), 0, n, jnp.int32))(key)
        vals = jax.jit(lambda k: jax.random.normal(
            k, (n, w), jnp.float32))(key)
        A = ELLOperator(cols, vals, shape=(n, n))
        X = jnp.ones((n, blk), jnp.float32)
        dt = timeit(jax.jit(A.matmat), X)
        print(f"ELL n=2^18 w={w} blk={blk}: {dt*1e3:.3f} ms, "
              f"{n*w*blk/dt/1e9:.2f} Gnnz/s", flush=True)

    # --- solver gemms ----------------------------------------------------
    n, mmax = 1 << 20, 24
    V = jnp.ones((n, mmax), jnp.float32)
    Y = jnp.ones((n, 1), jnp.float32)
    for prec in ["HIGHEST", "DEFAULT"]:
        g = jax.jit(lambda V, Y: jnp.matmul(
            V.T, Y, precision=getattr(jax.lax.Precision, prec)))
        dt = timeit(g, V, Y)
        print(f"gram [2^20x{mmax}]' [2^20x1] {prec}: {dt*1e3:.3f} ms "
              f"({2*n*mmax*4/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
