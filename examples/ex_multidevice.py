"""Multi-device example (analogue of examples/ex_eigs_mpi.c): row-shard a
3-D Laplacian eigensolve over every available device. Run with real TPU
chips, or simulate with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import os
import sys

# The axon TPU plugin overrides the JAX_PLATFORMS environment variable,
# so pin the platform via jax.config (PTPU_PLATFORM=tpu to target real
# chips); the virtual 8-device CPU mesh needs
# XLA_FLAGS=--xla_force_host_platform_device_count=8 in the environment.
import jax

jax.config.update("jax_platforms", os.environ.get("PTPU_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax.sharding import Mesh

import primme_tpu as pt


def main():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("rows",))
    print(f"mesh: {len(devs)} x {devs[0].platform}")

    nx = 8 * len(devs)
    A = pt.Stencil3DOperator(nx, 16, 16, dtype=np.float32)
    with mesh:
        evals, evecs = pt.eigsh(A, k=4, which="SA", tol=1e-4, mesh=mesh,
                                jacobi=True, raise_for_unconverged=False)
    print("smallest eigenvalues:", evals)


if __name__ == "__main__":
    main()
