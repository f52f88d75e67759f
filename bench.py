"""Headline benchmark: preconditioned eigensolve on a 3-D Laplacian.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The benchmark mirrors BASELINE.md's north-star config (3-D Laplacian,
Jacobi preconditioner, smallest pairs, block GD+k): wall-clock to converge
k=10 smallest eigenpairs of a 64^3 (262,144-row) Laplacian to
||r|| <= 1e-5 ||A|| in f32 on one chip. ``vs_baseline`` compares against a
reference wall-time anchor measured for the upstream PRIMME C library
(double precision, same operator/k/tol semantics) — values > 1 are faster
than the anchor.
"""

import json
import sys
import time

import numpy as np


# Anchor: MEASURED on this host — upstream PRIMME (C library + its Python
# binding, f64, scipy-sparse matvec, JDQMR_ETol + Jacobi, same 64^3
# Laplacian k=10 tol=1e-5): 12.74 s / 913 matvecs (min of 2 runs,
# 2026-08-17; build recipe in benches/vs_reference.py).
BASELINE_WALL_S = 12.74


def main():
    import jax
    import jax.numpy as jnp
    from primme_tpu import (PrimmeParams, Method, set_method,
                            Stencil3DOperator, JacobiPrecond)
    from primme_tpu.core.solver import solve_eigs

    nx = ny = nz = 64
    n = nx * ny * nz
    A = Stencil3DOperator(nx, ny, nz, dtype=jnp.float32)
    K = JacobiPrecond(A.diagonal())
    # minRestartSize=14 > k: restarts keep all converged pairs plus room
    # (~25% fewer matvecs than the block-aligned default of 9);
    # re-swept under the round-5 probe: 24/14 0.153 s / 24/16 0.162 s /
    # 28/14 0.161 s / 26/16 0.188 s. max_matvecs covers the
    # verification probe rounds on top of the solve (~430 mv here, see
    # num_probe_matvecs in the output).
    p = PrimmeParams(n=n, num_evals=10, eps=1e-5, max_basis_size=24,
                     max_block_size=2, min_restart_size=14,
                     max_matvecs=16000, locking=0)
    # JDQMR_ETol: the QMR inner loop costs ~1 matvec + 2 dots per step —
    # 3x faster wall-clock than GD+k on this config; blockSize=2 batches
    # the QMR vector ops and beats blk=1 by ~12% wall (benches/tune.py).
    p = set_method(Method.JDQMR_ETol, p, has_precond=True)
    from primme_tpu.core.inner import jdqmr_inner_solve

    v0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 2)), jnp.float32)

    run = jax.jit(lambda v0: solve_eigs(A, p, K=K, v0=v0, dtype=jnp.float32,
                                        inner_solve=jdqmr_inner_solve))
    # compile
    res = run(v0)
    res.evals.block_until_ready()
    # timed: min of 3 (tunneled-device timings are noisy)
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(v0)
        res.evals.block_until_ready()
        wall = min(wall, time.perf_counter() - t0)

    evals = np.asarray(res.evals)
    # analytic spectrum of the 7-pt Dirichlet Laplacian
    th = lambda m, N: 2 - 2 * np.cos(np.pi * m / (N + 1)) + 4 * np.sin(
        np.pi / (2 * (N + 1))) ** 2 * 0  # noqa: E731 (per-axis term below)
    ax = lambda N: 2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1))  # noqa: E731
    lam = (ax(nx)[:3, None, None] + ax(ny)[None, :3, None]
           + ax(nz)[None, None, :3]).ravel()
    lam = np.sort(lam)[:10]
    err = float(np.abs(np.sort(evals) - lam).max())

    # Correctness gate: the solve must return the true 10 smallest pairs
    # (set equality vs the analytic spectrum, not just residuals) at the
    # requested tolerance. A benchmark number for a wrong answer is void.
    anorm = float(res.stats.anorm_estimate)
    max_res = float(np.asarray(res.resnorms).max())
    ok = bool(max_res <= 1.5e-5 * anorm) and bool(err <= 1e-4)

    print(json.dumps({
        "metric": "laplacian64_k10_jacobi_jdqmr_wall",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall, 3),
        "extra": {
            "ok": ok,
            "num_matvecs": int(res.stats.num_matvecs),
            "eval_err_vs_analytic": err,
            "max_resnorm": max_res,
            "resnorm_tol": 1.5e-5 * anorm,
            "num_probe_rounds": int(res.stats.num_probe_rounds),
            "num_probe_matvecs": int(res.stats.num_probe_matvecs),
            "n": n,
            "device": str(jax.devices()[0].platform),
        },
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
