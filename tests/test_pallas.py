"""Pallas kernel prototypes (interpret-mode validation on CPU)."""

import numpy as np
import jax.numpy as jnp

from primme_tpu.ops.pallas_banded import banded_matmat_pallas
from primme_tpu.operators import BandedOperator


def test_banded_pallas_interpret():
    rng = np.random.default_rng(0)
    n, k = 1000, 4
    offs = (0, 1, -1, 64, -64)
    vals = jnp.asarray(rng.normal(size=(len(offs), n)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    y_ref = np.asarray(BandedOperator(offs, vals).matmat(X))
    y_pal = np.asarray(banded_matmat_pallas(offs, vals, X, True))
    assert np.abs(y_ref - y_pal).max() < 1e-4
