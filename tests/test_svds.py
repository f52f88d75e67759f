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


def test_orthou0_deflated_resume(rect):
    """orthou0/orthov0 (primme.pyx:1127-1134): a second solve constrained
    to the first solve's triplets returns the NEXT largest values — a
    deflated resume of a partial SVD."""
    A, sv = rect
    U1, s1, Vt1 = svds(A, k=3, which="LM", tol=1e-10)
    U2, s2, Vt2 = svds(A, k=3, which="LM", tol=1e-10,
                       orthou0=U1, orthov0=Vt1.conj().T)
    assert np.abs(np.sort(s1) - sv[-3:]).max() < 1e-8 * sv[-1]
    assert np.abs(np.sort(s2) - sv[-6:-3]).max() < 1e-8 * sv[-1]
    # the two triplet sets are mutually orthogonal
    assert np.abs(U1.T @ U2).max() < 1e-6
    assert np.abs(Vt1 @ Vt2.T).max() < 1e-6


def test_orthov0_one_sided(rect):
    """With only one side given, the other is completed through A
    (check_pair, primme.pyx:1339-1343)."""
    A, sv = rect
    U1, s1, Vt1 = svds(A, k=2, which="LM", tol=1e-10)
    _, s2, _ = svds(A, k=2, which="LM", tol=1e-10, orthov0=Vt1.conj().T)
    assert np.abs(np.sort(s2) - sv[-4:-2]).max() < 1e-8 * sv[-1]


def test_svds_user_convtest(rect):
    """User convtest replaces the per-stage defaults (primme.pyx: the
    tol value is ignored when convtest is given): an accept-everything
    test terminates the solve almost immediately despite tol=1e-12,
    while a sharpened test drives residuals past the default bar."""
    import jax.numpy as jnp
    A, sv = rect

    def accept_all(svals, resnorms, tol, anorm):
        return jnp.ones(resnorms.shape, bool)

    _, s_loose, _, st_loose = svds(A, k=3, which="LM", tol=1e-12,
                                   convtest=accept_all, return_stats=True,
                                   raise_for_unconverged=False)
    _, s_tight, _, st_tight = svds(A, k=3, which="LM", tol=1e-12,
                                   return_stats=True)
    # solve-only matvecs (the spectrum-verification probe fires exactly
    # because accept-all declares instant convergence; its cost is
    # reported separately and not part of what convtest governs)
    mv = lambda st: (st.get("stage1_num_matvecs", 0)  # noqa: E731
                     + st.get("stage2_num_matvecs", 0)
                     - st.get("stage1_num_probe_matvecs", 0)
                     - st.get("stage2_num_probe_matvecs", 0))
    assert mv(st_loose) < mv(st_tight)
    # loose acceptance -> visibly looser residuals than the tight run
    assert (np.max(st_loose["resnorms"])
            > 10 * max(np.max(st_tight["resnorms"]), 1e-300))


def test_svds_monitor_and_history(rect):
    """Per-stage monitor events (monitor_stage1/stage2,
    src/svds/primme_svds_c.c:1763+) and return_history."""
    A, sv = rect
    seen = []

    def mon(stage, event, num_outer, num_matvecs, num_locked,
            num_converged, basis_size, num_inner, svals, resnorms):
        seen.append((stage, int(event)))

    _, s, _, st = svds(A, k=3, which="SM", tol=1e-9, monitor=mon,
                       return_stats=True, return_history=True)
    stages = {sgt for sgt, _ in seen}
    assert 1 in stages  # stage-1 (normal equations) events arrived
    h = st["hist"]
    assert len(h["stage"]) == len(seen) and len(h["svals"]) == len(seen)
    # history singular values are on the TRIPLET scale: stage-1 records
    # sqrt(theta), so every recorded converged value must lie inside the
    # singular spectrum's range, not its square
    smax = sv[-1]
    for sgt, sval_rec in zip(h["stage"], h["svals"]):
        assert np.nanmax(np.abs(np.asarray(sval_rec, float))) < 3 * smax
    assert np.abs(np.sort(s) - sv[:3]).max() < 1e-7 * sv[-1]


def test_sm_depth_rule_nn512():
    """Depth-rule regression (BASELINE.md "svds-SM stage-1 depth"):
    at nn=512 the deep (96) stage-1 basis returns spurious extra tiny
    values or misses a quadruple member (measured on 3 seeds); the
    production rule must keep nn=512 on the shallow side and find
    EXACTLY the planted near-null quadruple."""
    rng = np.random.default_rng(0)
    nn = 512
    m = nn + 1
    sv = np.concatenate([np.full(4, 1.5e-9),
                         np.linspace(1.0, 50.0, nn - 4)])
    U, _ = np.linalg.qr(rng.normal(size=(m, nn)))
    V, _ = np.linalg.qr(rng.normal(size=(nn, nn)))
    A = (U * sv[None, :]) @ V.T
    _, s, _, st = svds(A, k=5, which="SM", tol=7e-12, return_stats=True,
                       maxiter=250000, raise_for_unconverged=False)
    tiny = np.sort(s)[np.sort(s) < 1e-6]
    assert len(tiny) == 4, np.sort(s)
    assert np.abs(tiny - 1.5e-9).max() < 1e-10
    assert abs(np.sort(s)[4] - 1.0) < 1e-6


def test_augmented_rect_sm_honest():
    """Pure-augmented SM on a rectangular matrix: the augmented operator
    has |m-n| genuine null vectors that are not singular triplets. The
    reference returns an EMPTY result on this config; this framework
    reports any null artifact slot honestly as NaN/inf (and raises by
    default) instead of returning sigma~0 'triplets'."""
    rng = np.random.default_rng(7907*0 + 40 + 3*30)
    sv = np.linspace(1.0, 20.0, 30)
    U = np.linalg.qr(rng.normal(size=(40, 30)))[0]
    V = np.linalg.qr(rng.normal(size=(30, 30)))[0]
    A = (U * sv[None, :]) @ V.T
    u, s, vt, st = svds(A, k=3, which="SM", tol=1e-9, method="augmented",
                        maxiter=60000, return_stats=True,
                        raise_for_unconverged=False)
    good = np.isfinite(s) & np.isfinite(st["resnorms"])
    # every FINITE returned value is a true singular value; no sigma~0
    # artifact is reported as converged
    for v in s[good]:
        assert np.abs(sv - v).min() < 1e-6
    assert not np.any(s[good] < 0.5)
