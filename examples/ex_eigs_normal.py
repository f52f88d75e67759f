"""Normal (non-Hermitian) operator example (analogue of the reference's
``examples/ex_eigs_zseq_normal.c``): eigenvalues of a normal operator are
complex; PRIMME's ``*_normal`` entry points handle any A with
A A^H = A^H A. Here: a circulant shift matrix, whose spectrum is the unit
circle's n-th roots of unity."""

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

import primme_tpu as pt


def main():
    n = 256
    # circulant shift: C e_j = e_{j+1 mod n}; normal, eigenvalues
    # exp(2 pi i k / n)
    C = np.zeros((n, n), dtype=np.complex128)
    C[np.arange(1, n), np.arange(n - 1)] = 1.0
    C[0, n - 1] = 1.0

    # 4 eigenvalues closest to 1 (the roots of unity nearest the real axis)
    evals, evecs = pt.eigs(C, k=4, which="SM", sigma=1.0, tol=1e-9)
    print("closest to 1:", np.sort_complex(evals))
    ref = np.exp(2j * np.pi * np.arange(n) / n)
    ref4 = ref[np.argsort(np.abs(ref - 1.0))[:4]]
    print("exact       :", np.sort_complex(ref4))

    # largest real part, with the inner GMRES correction solver (the
    # JD-style path for normal operators)
    evals, evecs = pt.eigs(C, k=4, which="LR", tol=1e-9, method="JDQMR")
    print("largest real part:", np.sort_complex(evals))

    # residuals of the returned pairs
    R = C @ evecs - evecs * evals[None, :]
    print("max residual:", np.linalg.norm(R, axis=0).max())


if __name__ == "__main__":
    main()
