"""Lane-major kernel prototypes match the column-layout operators."""

import numpy as np
import jax.numpy as jnp

from primme_tpu.ops import transposed as T
from primme_tpu.operators import BandedOperator, Stencil3DOperator
from primme_tpu.core.linalg import gram, bcomb


def test_gram_bcomb_T():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 5))
    Y = rng.normal(size=(64, 3))
    C = rng.normal(size=(5, 3))
    assert np.allclose(np.asarray(T.gram_T(jnp.asarray(X.T), jnp.asarray(Y.T))),
                       np.asarray(gram(jnp.asarray(X), jnp.asarray(Y))))
    assert np.allclose(np.asarray(T.bcomb_T(jnp.asarray(X.T), jnp.asarray(C))),
                       np.asarray(bcomb(jnp.asarray(X), jnp.asarray(C))).T)


def test_banded_T():
    rng = np.random.default_rng(1)
    n, k = 200, 4
    offs = (0, 2, -1)
    vals = jnp.asarray(rng.normal(size=(3, n)))
    X = rng.normal(size=(n, k))
    A = BandedOperator(offs, vals)
    y1 = np.asarray(A.matmat(jnp.asarray(X)))
    y2 = np.asarray(T.banded_matmat_T(offs, vals, jnp.asarray(X.T))).T
    assert np.abs(y1 - y2).max() < 1e-12


def test_stencil_T():
    rng = np.random.default_rng(2)
    nx = ny = nz = 8
    k = 3
    A = Stencil3DOperator(nx, ny, nz, dtype=jnp.float64)
    X = rng.normal(size=(nx * ny * nz, k))
    y1 = np.asarray(A.matmat(jnp.asarray(X)))
    y2 = np.asarray(T.stencil3d_matmat_T(nx, ny, nz, jnp.asarray(X.T))).T
    assert np.abs(y1 - y2).max() < 1e-12
