"""Combinatorial interface sweep (the reference generates ~402 method x
size x numEvals x target tests, tests/Makefile:146-180). Every preset in
the Method catalog is exercised over extreme targets x k, and the
interior-capable subset over a shifted target — 112 combinations on a
well-separated fixture.

The XLA CPU backend aborts after ~80 compiled solver configs in one
process (compile-cache OOM); caches are cleared every ~30 cases here on
top of conftest's per-module clear.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from primme_tpu import eigsh, Method


@pytest.fixture(scope="module")
def fixture():
    n = 80
    A = sp.diags([np.linspace(1, 40, n), 0.5 * np.ones(n - 1),
                  0.5 * np.ones(n - 1)], [0, 1, -1]).tocsr()
    return A, np.linalg.eigvalsh(A.toarray())


_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _cache_relief():
    yield
    _COUNT["n"] += 1
    if _COUNT["n"] % 30 == 0:
        jax.clear_caches()


ALL_METHODS = list(Method)
TARGETS = ["SA", "LA"]
KS = [1, 3, 7]

# presets whose correction equation is meaningful at an interior shift
INTERIOR_METHODS = [Method.GD, Method.GD_plusK, Method.JD_Olsen_plusK,
                    Method.JDQMR, Method.JDQMR_ETol, Method.GD_Olsen_plusK,
                    Method.DEFAULT_MIN_MATVECS, Method.DEFAULT_MIN_TIME]


@pytest.mark.parametrize("method", ALL_METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("which", TARGETS)
@pytest.mark.parametrize("k", KS)
def test_sweep(fixture, method, which, k):
    A, ref = fixture
    vals, _ = eigsh(A, k=k, which=which, tol=1e-8, method=method,
                    maxMatvecs=6000, raise_for_unconverged=False)
    expect = ref[:k] if which == "SA" else ref[-k:]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} {which} k={k}: {err:.2e}"


@pytest.mark.parametrize("method", INTERIOR_METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("k", [1, 3])
def test_sweep_interior(fixture, method, k):
    A, ref = fixture
    sigma = 20.2
    vals, _ = eigsh(A, k=k, which="SM", sigma=sigma, tol=1e-8,
                    method=method, maxMatvecs=6000,
                    raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - sigma))][:k]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} SM k={k}: {err:.2e}"
