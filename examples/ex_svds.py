"""Singular-triplet examples (analogue of examples/ex_svds_*): largest and
smallest triplets of a rectangular operator via the hybrid two-stage
method."""

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


def main():
    rng = np.random.default_rng(0)
    A = sp.random(500, 300, density=0.05, random_state=1) \
        + sp.diags(np.linspace(1, 30, 300), 0, shape=(500, 300))

    U, s, Vt = pt.svds(A, k=5, which="LM", tol=1e-8)
    print("largest singular values:", s)

    U, s, Vt = pt.svds(A, k=3, which="SM", tol=1e-6, maxiter=40000)
    print("smallest singular values:", s)

    # closest to a target value
    U, s, Vt = pt.svds(A, k=2, which=15.0, tol=1e-8)
    print("closest to 15:", s)


if __name__ == "__main__":
    main()
