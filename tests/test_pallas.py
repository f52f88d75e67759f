"""Pallas kernels (interpret-mode validation on CPU; the lane-major
kernel also compiles and is bit-exact on real Mosaic — measured on one
TPU chip, see ops/pallas_banded.py)."""

import numpy as np
import jax.numpy as jnp

from primme_tpu.ops.pallas_banded import (banded_matmat_pallas,
                                          banded_matmat_pallas_T)
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


def test_banded_pallas_lane_major_interpret():
    """Lane-major packed-DMA kernel: X stored [k, n] so every HBM slice
    is 128-aligned along the minor axis (the Mosaic constraint that
    blocked the [n, k] variant)."""
    rng = np.random.default_rng(1)
    n, k = 3000, 4
    offs = (0, 1, -1, 37, -37, 400, -400)
    vals = jnp.asarray(rng.normal(size=(len(offs), n)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    y_ref = np.asarray(BandedOperator(offs, vals).matmat(X))
    y_pal = np.asarray(banded_matmat_pallas_T(offs, vals, X.T, True)).T
    assert np.abs(y_ref - y_pal).max() < 1e-4


def test_banded_pallas_lane_major_hardware():
    """Real-Mosaic compile + correctness when a TPU is attached (skipped
    on CPU CI — the conftest pins JAX_PLATFORMS=cpu there)."""
    import pytest
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU attached")
    rng = np.random.default_rng(2)
    n, k = 1 << 16, 8
    offs = (0, 1, -1, 64, -64)
    vals = jnp.asarray(rng.normal(size=(len(offs), n)), jnp.float32)
    Xt = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    y_hw = np.asarray(banded_matmat_pallas_T(offs, vals, Xt))
    y_ref = np.asarray(BandedOperator(offs, vals).matmat(Xt.T)).T
    assert np.abs(y_hw - y_ref).max() < 1e-4
