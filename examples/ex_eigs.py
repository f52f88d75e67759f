"""Basic eigenvalue examples (analogue of the reference's
examples/ex_eigs_dseq.c family): smallest/largest/interior pairs of a
Laplacian, preconditioned and not, with stats and history."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# f64 examples (the reference's examples are double-precision sequential
# C programs). The axon TPU plugin overrides JAX_PLATFORMS, so the
# platform must be pinned via jax.config (same as primme_tpu.driver);
# set PTPU_PLATFORM=tpu to run the f32-capable parts on the accelerator.
jax.config.update("jax_platforms", os.environ.get("PTPU_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp

import primme_tpu as pt


def laplacian_1d(n):
    return sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                    [0, 1, -1]).tocsr()


def main():
    n = 1000
    A = laplacian_1d(n)

    # 5 smallest eigenpairs
    evals, evecs = pt.eigsh(A, k=5, which="SA", tol=1e-8)
    print("smallest:", evals)

    # 5 largest with the JDQMR_ETol method and Jacobi preconditioning
    evals, evecs, stats = pt.eigsh(A, k=5, which="LA", tol=1e-8,
                                   method=pt.Method.JDQMR_ETol, jacobi=True,
                                   return_stats=True)
    print("largest:", evals, f"({stats['num_matvecs']} matvecs, "
          f"{stats['elapsed_time']:.2f}s)")

    # 4 interior pairs closest to 1.0, refined extraction
    evals, evecs = pt.eigsh(A, k=4, which="SM", sigma=1.0, tol=1e-8,
                            projection="refined", raise_for_unconverged=False)
    print("closest to 1.0:", evals)

    # convergence history
    evals, evecs, stats = pt.eigsh(A, k=2, which="SA", tol=1e-8,
                                   return_stats=True, return_history=True)
    h = stats["hist"]
    print(f"history: {len(h['num_matvecs'])} outer iterations recorded, "
          f"final res {h['resnorms'][-1]}")


if __name__ == "__main__":
    main()
