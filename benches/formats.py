"""Sparse-format comparison via fixed-budget END-TO-END solves.

Microbenchmark timings are unreliable over the axon tunnel (async
dispatch, 30-40x run-to-run variance), so each format is measured as the
wall-clock of an identical fixed-matvec-budget GD solve on the SAME
matrix — solver overhead is common-mode, so wall differences isolate the
matvec path. Implied matvec cost is (wall_fmt - wall_stencil_floor).

Matrix: 3-D 27-point Laplacian (regular banded structure after RCM —
DIA-friendly) and a randomly row/col-permuted copy (defeats RCM; the
scattered-sparsity case BlockELL exists for).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_27pt(m):
    import scipy.sparse as sp
    one = np.ones(m)
    t = sp.diags([one[:-1], 2 * one, one[:-1]], [-1, 0, 1])
    e = sp.diags([one[:-1], one, one[:-1]], [-1, 0, 1])
    A = (sp.kron(sp.kron(t, e), e) + sp.kron(sp.kron(e, t), e)
         + sp.kron(sp.kron(e, e), t)).tocsr()
    return A


def run_fixed(A_op, n, budget=400, blk=4):
    import jax
    import jax.numpy as jnp
    from primme_tpu import PrimmeParams, Method, set_method
    from primme_tpu.core.solver import solve_eigs

    p = PrimmeParams(n=n, num_evals=4, eps=1e-12, max_basis_size=24,
                     max_block_size=blk, max_matvecs=budget, locking=0)
    p = set_method(Method.GD_plusK, p, has_precond=False)
    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, blk)),
                     jnp.float32)
    # operator passed as a pytree ARGUMENT (as the product path does) —
    # closing over it would embed its arrays as HLO constants and blow up
    # the remote compile request
    run = jax.jit(lambda op, v0: solve_eigs(op, p, v0=v0, dtype=jnp.float32))
    run = lambda v0, _r=run: _r(A_op, v0)
    res = run(v0)
    jax.block_until_ready(res.evals)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(v0)
        jax.block_until_ready(res.evals)
        walls.append(time.perf_counter() - t0)
    return min(walls), int(res.stats.num_matvecs)


def main():
    import jax.numpy as jnp
    from primme_tpu import (ELLOperator, BlockELLOperator, BandedOperator,
                            Stencil3DOperator)

    m = 48
    n = m ** 3
    A = build_27pt(m).astype(np.float32)
    nnz = A.nnz
    print(f"27-pt Laplacian m={m} n={n} nnz={nnz}", flush=True)

    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    Ap = A[perm][:, perm].tocsr()

    from primme_tpu import WindowedELLOperator
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    prcm = reverse_cuthill_mckee(Ap, symmetric_mode=True)
    Ar = Ap[prcm][:, prcm].tocsr()
    cases = [
        ("stencil(7pt floor)", Stencil3DOperator(m, m, m, dtype=jnp.float32)),
        ("banded/DIA", BandedOperator.from_scipy(A)),
        ("ELL (gather)", ELLOperator.from_scipy(A)),
        ("BlockELL b=8", BlockELLOperator.from_scipy(A, block_size=8)),
        ("ELL permuted", ELLOperator.from_scipy(Ap)),
        ("BlockELL permuted b=8", BlockELLOperator.from_scipy(Ap, block_size=8)),
        ("WindowedELL permuted+RCM", WindowedELLOperator.from_scipy(Ar)),
    ]
    budget = int(os.environ.get("FMT_BUDGET", "400"))
    for name, op in cases:
        if op is None:
            print(f"{name:24s} pack rejected", flush=True)
            continue
        try:
            wall, mv = run_fixed(op, n, budget=budget)
            per_mv = wall / mv * 1e3
            gnnz = nnz * mv / wall / 1e9
            print(f"{name:24s} wall={wall:.3f}s mv={mv} "
                  f"{per_mv:.3f} ms/mv ~{gnnz:.1f} Gnnz/s(incl. solver)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
