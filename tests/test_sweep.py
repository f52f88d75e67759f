"""Scaled-down combinatorial sweep (the reference generates ~402 method x
size x numEvals x target interface tests, tests/Makefile:146-180). Here a
representative product over methods x targets x k on a small fixture."""

import numpy as np
import pytest
import scipy.sparse as sp

from primme_tpu import eigsh, Method


@pytest.fixture(scope="module")
def fixture():
    n = 80
    rng = np.random.default_rng(7)
    A = sp.diags([np.linspace(1, 40, n), 0.5 * np.ones(n - 1),
                  0.5 * np.ones(n - 1)], [0, 1, -1]).tocsr()
    return A, np.linalg.eigvalsh(A.toarray())


METHODS = [Method.GD_Olsen_plusK, Method.JDQMR_ETol, Method.LOBPCG_OrthoBasis]
TARGETS = ["SA", "LA"]
KS = [1, 3, 7]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("which", TARGETS)
@pytest.mark.parametrize("k", KS)
def test_sweep(fixture, method, which, k):
    A, ref = fixture
    vals, _ = eigsh(A, k=k, which=which, tol=1e-8, method=method,
                    maxMatvecs=4000, raise_for_unconverged=False)
    expect = ref[:k] if which == "SA" else ref[-k:]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} {which} k={k}: {err:.2e}"
