"""Distributed general-sparse example (analogue of
examples/ex_eigs_petsc.c): a user's sparse matrix row-partitioned over
the device mesh with the reference's halo communication contract
(include/primme_eigs.h:188-198 — each rank owns nLocal rows and the
matvec exchanges only boundary data, tests/COMMON/petscw.c).

TPU-natively that contract is `primme_tpu.distributed.HaloELLOperator`:
window-relative ELL columns, `shard_map` matvec, single-hop
`lax.ppermute` halo exchange — O(halo*k) bytes per matvec per shard,
independent of n (verified by compiled-HLO inspection in
tests/test_distributed.py).

Run with real TPU chips, or simulate with
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
import scipy.sparse as sp
from jax.sharding import Mesh

import primme_tpu as pt
from primme_tpu.distributed import HaloELLOperator


def main():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("rows",))
    print(f"mesh: {len(devs)} x {devs[0].platform}")

    # a general sparse matrix (2-D 9-point Laplacian): bandwidth-bounded
    # after (optional, automatic) RCM, so every nnz is within one-shard
    # reach and the partition needs only an h-row halo
    m = 64
    one = np.ones(m)
    t = sp.diags([one[:-1], 2 * one, one[:-1]], [-1, 0, 1])
    e = sp.diags([one[:-1], one, one[:-1]], [-1, 0, 1])
    A = (sp.kron(t, e) + sp.kron(e, t)).tocsr()
    n = A.shape[0]

    op, perm = HaloELLOperator.from_scipy(A, mesh)
    print(f"n={n} nnz={A.nnz} halo={op.halo} rows/shard={n // len(devs)}"
          + ("  (RCM-permuted)" if perm is not None else ""))

    with mesh:
        evals, evecs = pt.eigsh(op, k=4, which="SA", tol=1e-5, mesh=mesh,
                                raise_for_unconverged=False)
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        evecs = np.asarray(evecs)[inv, :]   # back to the user's row order
    dense_ref = np.sort(np.linalg.eigvalsh(A.toarray()))[:4]
    print("smallest eigenvalues:", evals)
    print("max |err| vs dense:  ", np.abs(np.sort(evals) - dense_ref).max())
    R = A @ evecs - evecs * np.asarray(evals)[None, :]
    print("max residual:        ", np.linalg.norm(R, axis=0).max())


if __name__ == "__main__":
    main()
