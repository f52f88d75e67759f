"""Two-stage SVDS tests vs scipy ground truth (Python/tests.py model)."""

import numpy as np
import pytest
import scipy.sparse as sp

from primme_tpu import svds


@pytest.fixture(scope="module")
def rect():
    rng = np.random.default_rng(0)
    m, n = 200, 150
    U = np.linalg.qr(rng.normal(size=(m, n)))[0]
    V = np.linalg.qr(rng.normal(size=(n, n)))[0]
    sv = np.linspace(1, 50, n)[::-1]
    return U @ np.diag(sv) @ V.T, np.sort(sv)


@pytest.mark.parametrize("which", ["LM", "SM"])
def test_hybrid(rect, which):
    A, sv = rect
    U, s, Vt = svds(A, k=5, which=which, tol=1e-10)
    expect = sv[-5:] if which == "LM" else sv[:5]
    assert np.abs(np.sort(s) - np.sort(expect)).max() < 1e-8 * sv[-1]
    R = A @ Vt.conj().T - U * s[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7 * sv[-1]
    # orthonormal singular vectors
    assert np.abs(U.T @ U - np.eye(5)).max() < 1e-8
    assert np.abs(Vt @ Vt.T - np.eye(5)).max() < 1e-8


@pytest.mark.parametrize("method", ["normalequations", "augmented"])
def test_single_stage(rect, method):
    A, sv = rect
    U, s, Vt = svds(A, k=4, which="LM", tol=1e-9, method=method)
    assert np.abs(np.sort(s) - sv[-4:]).max() < 1e-7 * sv[-1]


def test_wide_matrix():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(80, 120))  # m < n: AAt path
    sref = np.linalg.svd(A, compute_uv=False)
    U, s, Vt = svds(A, k=5, which="LM", tol=1e-10)
    assert np.abs(np.sort(s) - np.sort(sref)[-5:]).max() < 1e-8 * sref[0]


def test_sparse_input():
    rng = np.random.default_rng(2)
    A = sp.random(300, 200, density=0.05, random_state=3)
    sref = np.linalg.svd(A.toarray(), compute_uv=False)
    U, s, Vt = svds(A, k=4, which="LM", tol=1e-9)
    assert np.abs(np.sort(s) - np.sort(sref)[-4:]).max() < 1e-7


def test_complex():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(100, 70)) + 1j * rng.normal(size=(100, 70))
    sref = np.linalg.svd(A, compute_uv=False)
    U, s, Vt = svds(A, k=4, which="LM", tol=1e-9)
    assert np.abs(np.sort(s) - np.sort(sref)[-4:]).max() < 1e-7 * sref[0]
    R = A @ Vt.conj().T - U * s[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * sref[0]


def test_rect_mtx_reference():
    """rect.mtx from the reference test suite (tests/rect.mtx, configs
    test_2??)."""
    import scipy.io as sio

    A = sio.mmread("/root/reference/tests/rect.mtx").tocsr()
    sref = np.linalg.svd(A.toarray(), compute_uv=False)
    U, s, Vt = svds(A, k=5, which="LM", tol=1e-9)
    assert np.abs(np.sort(s) - np.sort(sref)[-5:]).max() < 1e-7 * sref[0]


def test_svds_precond_aha(rect):
    """precAHA: preconditioner for A^H A - sigma (primme.pyx:1074)."""
    A, sv = rect
    d = np.asarray((A * A).sum(axis=0)).ravel()  # diag(A^T A)
    from primme_tpu import JacobiPrecond
    U, s, Vt, st = svds(A, k=5, which="LM", tol=1e-9,
                        precAHA=JacobiPrecond(d), return_stats=True)
    assert np.abs(np.sort(s) - sv[-5:]).max() < 1e-7 * sv[-1]


def test_svds_sigma_closest(rect):
    A, sv = rect
    target = float(sv[len(sv) // 2])
    U, s, Vt = svds(A, k=3, which=target, tol=1e-9)
    expect = sv[np.argsort(np.abs(sv - target))][:3]
    assert np.abs(np.sort(s) - np.sort(expect)).max() < 1e-6 * sv[-1]
