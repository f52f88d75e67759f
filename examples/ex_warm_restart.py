"""Warm restart / incremental solve (the reference's checkpoint-resume
design, SURVEY.md §5): converged pairs from one call are fed back as
orthogonal constraints (``lock=``, the analogue of ``numOrthoConst``) so a
later call extends the set without re-converging them — exactly how the
reference's SVDS stage 2 resumes from stage 1
(``src/svds/primme_svds_c.c``)."""

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
    n = 1200
    rng = np.random.default_rng(3)
    d = np.linspace(1, 500, n)
    A = sp.diags([d, np.ones(n - 1), np.ones(n - 1)], [0, 1, -1]).tocsr()

    # phase 1: 4 smallest pairs ("checkpoint" = the returned evecs)
    v1, X1, s1 = pt.eigsh(A, k=4, which="SA", tol=1e-10, return_stats=True)
    print("phase 1:", v1, f"({s1['num_matvecs']} matvecs)")

    # phase 2 (resume): next 4 pairs, deflating the saved ones
    v2, X2, s2 = pt.eigsh(A, k=4, which="SA", tol=1e-10, lock=X1,
                          return_stats=True)
    print("phase 2:", v2, f"({s2['num_matvecs']} matvecs)")

    both = np.sort(np.concatenate([v1, v2]))
    ref = np.sort(np.linalg.eigvalsh(A.toarray()))[:8]
    print("max error vs dense over all 8:", np.abs(both - ref).max())

    # cold solve of all 8 at once, for comparison
    v8, _, s8 = pt.eigsh(A, k=8, which="SA", tol=1e-10, return_stats=True)
    print(f"cold 8-pair solve: {s8['num_matvecs']} matvecs vs "
          f"{s1['num_matvecs']} + {s2['num_matvecs']} warm")


if __name__ == "__main__":
    main()
