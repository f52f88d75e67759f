"""Headline-config tuning sweep (one chip): variants of the 64^3
Laplacian k=10 solve. End-to-end wall only (microbenches are unreliable
on the axon tunnel); min of 3 per variant."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, method_name, blk, mbs, precond, inner):
    import jax
    import jax.numpy as jnp
    from primme_tpu import (PrimmeParams, Method, set_method,
                            Stencil3DOperator, JacobiPrecond,
                            ChebyshevPrecond)

    from primme_tpu.core.solver import solve_eigs

    nx = 64
    n = nx ** 3
    A = Stencil3DOperator(nx, nx, nx, dtype=jnp.float32)
    if precond == "jacobi":
        K = JacobiPrecond(A.diagonal())
    elif precond == "cheb":
        K = ChebyshevPrecond.from_operator(A, degree=8)
    else:
        K = None
    p = PrimmeParams(n=n, num_evals=10, eps=1e-5, max_basis_size=mbs,
                     max_block_size=blk, max_matvecs=12000, locking=0)
    p = set_method(getattr(Method, method_name), p, has_precond=K is not None)
    inner_solve = None
    if inner:
        from primme_tpu.core.inner import jdqmr_inner_solve
        inner_solve = jdqmr_inner_solve
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, max(blk, 1))),
                     jnp.float32)
    run = jax.jit(lambda v0: solve_eigs(A, p, K=K, v0=v0, dtype=jnp.float32,
                                        inner_solve=inner_solve))
    res = run(v0)
    jax.block_until_ready(res.evals)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(v0)
        jax.block_until_ready(res.evals)
        walls.append(time.perf_counter() - t0)
    print(f"{name}: {min(walls):.3f}s (runs {[f'{w:.3f}' for w in walls]}) "
          f"mv={int(res.stats.num_matvecs)} "
          f"maxres={float(np.asarray(res.resnorms).max()):.2e}", flush=True)


VARIANTS = {
    "base_jdqmretol_blk1_mbs24_jacobi": ("JDQMR_ETol", 1, 24, "jacobi", True),
    "jdqmretol_blk2_mbs24_jacobi": ("JDQMR_ETol", 2, 24, "jacobi", True),
    "jdqmretol_blk1_mbs16_jacobi": ("JDQMR_ETol", 1, 16, "jacobi", True),
    "jdqmretol_blk1_mbs32_jacobi": ("JDQMR_ETol", 1, 32, "jacobi", True),
    "jdqmretol_blk1_mbs24_cheb8": ("JDQMR_ETol", 1, 24, "cheb", True),
    "jdqmretol_blk2_mbs24_cheb8": ("JDQMR_ETol", 2, 24, "cheb", True),
    "gdk_blk2_mbs24_cheb8": ("GD_Olsen_plusK", 2, 24, "cheb", False),
    "gdk_blk4_mbs32_cheb8": ("GD_Olsen_plusK", 4, 32, "cheb", False),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        run_variant(nm, *VARIANTS[nm])
