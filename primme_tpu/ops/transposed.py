"""Lane-major ("transposed") kernel prototypes for round 2.

Measured on one chip: storing the multivector block as ``[k, n]`` (vectors
as ROWS, the long dimension on the 128-lane axis) makes the banded SpMM
2.6-55x faster than the ``[n, k]`` layout (523 vs 9-204 Gnnz/s depending
on formulation), because `[n, k]` arrays with k << 128 are lane-padded in
HBM storage itself. The same constraint blocks the packed-DMA pallas path
(see ops/pallas_banded.py).

This module collects the transposed-layout building blocks so a future
solver refactor (store V/W/BV as ``[mmax, n]``) can swap them in:

* ``gram_T(X, Y)``   — X Y^H over the lane axis (== old gram(X^T, Y^T))
* ``bcomb_T(V, C)``  — C^T V (basis combination in row layout)
* ``banded_matmat_T`` — DIA matvec with shifts along lanes
* ``stencil3d_matmat_T`` — 7-point stencil on ``[k, nx, ny, nz]``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_T(X: jax.Array, Y: jax.Array) -> jax.Array:
    """X^H Y of column-layout == X.conj() @ Y.T in row layout.
    X: [mx, n], Y: [my, n] -> [mx, my]."""
    return jnp.matmul(X.conj(), Y.T, precision=jax.lax.Precision.HIGHEST)


def bcomb_T(V: jax.Array, C: jax.Array) -> jax.Array:
    """(V_cols @ C) in row layout: V: [m, n], C: [m, r] -> [r, n]."""
    return jnp.matmul(C.T, V, precision=jax.lax.Precision.HIGHEST)


def banded_matmat_T(offsets, vals: jax.Array, Xt: jax.Array) -> jax.Array:
    """DIA matvec, row layout: vals [B, n], Xt [k, n] -> [k, n]."""
    out = jnp.zeros_like(Xt)
    for b, off in enumerate(offsets):
        v = vals[b][None, :]
        if off == 0:
            out = out + v * Xt
        elif off > 0:
            out = out + v * jnp.pad(Xt[:, off:], ((0, 0), (0, off)))
        else:
            out = out + v * jnp.pad(Xt[:, :off], ((0, 0), (-off, 0)))
    return out


def stencil3d_matmat_T(nx: int, ny: int, nz: int, Xt: jax.Array,
                       scale: float = 1.0) -> jax.Array:
    """7-point Dirichlet Laplacian, row layout: Xt [k, nx*ny*nz]."""
    k = Xt.shape[0]
    g = Xt.reshape(k, nx, ny, nz)
    out = 6.0 * g
    out = out - jnp.pad(g[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    out = out - jnp.pad(g[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    out = out - jnp.pad(g[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    out = out - jnp.pad(g[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    out = out - jnp.pad(g[:, :, :, 1:], ((0, 0), (0, 0), (0, 0), (0, 1)))
    out = out - jnp.pad(g[:, :, :, :-1], ((0, 0), (0, 0), (0, 0), (1, 0)))
    return (scale * out).reshape(k, -1)
