"""User-supplied operator + preconditioner + convergence test + monitor —
the reference's core usage pattern, where the library never sees the
matrix, only callbacks (``primme_params.matrixMatvec``,
``applyPreconditioner``, ``convTestFun``, ``monitorFun``,
``include/primme_eigs.h:166-253``).

Here the operator is a matrix-free 2-D Laplacian written as a jittable
function on ``[n, k]`` blocks, the preconditioner is Chebyshev-polynomial
(the TPU-native stand-in for ILUT), and a custom convergence test accepts
pairs at a per-eigenvalue relative residual."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
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
    nx = ny = 96
    n = nx * ny

    def lap2d(X):
        """Matrix-free 5-point Laplacian on [n, k] blocks (Dirichlet)."""
        k = X.shape[1]
        G = X.reshape(nx, ny, k)
        out = 4.0 * G
        out = out.at[1:].add(-G[:-1]).at[:-1].add(-G[1:])
        out = out.at[:, 1:].add(-G[:, :-1]).at[:, :-1].add(-G[:, 1:])
        return out.reshape(n, k)

    A = pt.FunctionOperator(lap2d, shape=(n, n), dtype=jnp.float64,
                            diag=4.0 * jnp.ones((n,), jnp.float64))

    # Chebyshev preconditioner damping the unwanted upper spectrum
    # [0.5, 8] (||A|| <= 8 for the 5-point stencil)
    K = pt.ChebyshevPrecond(A, interval=(0.5, 8.0), degree=8)

    # custom convergence test: relative residual per pair
    def convtest(evals, resnorms, tol, anorm):
        return resnorms <= 1e-8 * jnp.maximum(jnp.abs(evals), 1e-3)

    events = []

    def monitor(event, **kw):
        events.append(int(event))

    evals, evecs, stats = pt.eigsh(
        A, k=6, which="SA", tol=1e-8, method=pt.Method.GD_Olsen_plusK,
        OPinv=K, convtest=convtest, monitor=monitor, return_stats=True)

    lam = lambda p, q: 4 * np.sin(p * np.pi / (2 * (nx + 1))) ** 2 \
        + 4 * np.sin(q * np.pi / (2 * (ny + 1))) ** 2
    exact = np.sort([lam(p, q) for p in range(1, 4) for q in range(1, 4)])[:6]
    print("smallest 6:", evals)
    print("exact     :", exact)
    print(f"matvecs={stats['num_matvecs']}  preconds={stats['num_preconds']}"
          f"  monitor events={len(events)}")


if __name__ == "__main__":
    main()
