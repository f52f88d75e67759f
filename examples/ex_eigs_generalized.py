"""Generalized eigenproblem A x = lambda M x (analogue of the reference's
mass-matrix configs, e.g. tests/tests/test_008 pairing LUNDA.mtx with
lund_b.mtx as B): a 1-D finite-element Laplacian with its consistent mass
matrix. PRIMME B-orthogonalizes the basis against M throughout
(``src/eigs/ortho.c`` Bortho); primme_tpu does the same via the ``M=``
argument."""

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
import scipy.linalg as sla
import scipy.sparse as sp

import primme_tpu as pt


def fem_1d(n):
    """P1 finite elements on [0, 1]: stiffness K and mass M."""
    h = 1.0 / (n + 1)
    K = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1]).tocsr() / h
    M = sp.diags([4.0 * np.ones(n), np.ones(n - 1), np.ones(n - 1)],
                 [0, 1, -1]).tocsr() * (h / 6.0)
    return K, M


def main():
    n = 400
    K, M = fem_1d(n)

    evals, evecs, stats = pt.eigsh(K, k=5, M=M, which="SA", tol=1e-9,
                                   return_stats=True)
    print("5 smallest generalized eigenvalues:", evals)
    print(f"  ({stats['num_matvecs']} matvecs)")
    # continuous problem: lambda_j = (j pi)^2
    print("continuum (j*pi)^2:", (np.arange(1, 6) * np.pi) ** 2)

    # M-orthonormality of the returned eigenvectors: evecs^T M evecs = I
    G = evecs.T @ (M @ evecs)
    print("max |V^T M V - I| =", np.abs(G - np.eye(5)).max())

    # cross-check against dense scipy
    ref = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)[:5]
    print("max eval error vs dense:", np.abs(np.sort(evals) - ref).max())


if __name__ == "__main__":
    main()
