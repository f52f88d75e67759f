"""Normal (non-Hermitian) operator tests — the KIND(N) axis
(dprimme_normal/zprimme_normal, src/eigs/template_normal.h)."""

import numpy as np
import pytest

from primme_tpu import eigs


def _match(vals, exp):
    """Set-wise complex match: greedy nearest-neighbour pairing."""
    vals = list(np.asarray(vals))
    err = 0.0
    for e in np.asarray(exp):
        i = int(np.argmin([abs(v - e) for v in vals]))
        err = max(err, abs(vals[i] - e))
        vals.pop(i)
    return err


@pytest.fixture(scope="module")
def normal_matrix():
    rng = np.random.default_rng(0)
    n = 120
    Q = np.linalg.qr(rng.normal(size=(n, n))
                     + 1j * rng.normal(size=(n, n)))[0]
    d = rng.normal(size=n) + 1j * rng.normal(size=n)
    return (Q * d[None, :]) @ Q.conj().T, d


@pytest.mark.parametrize("which", ["LM", "SR", "LR"])
def test_normal_targets(normal_matrix, which):
    A, d = normal_matrix
    vals, vecs = eigs(A, k=5, which=which, tol=1e-10, maxMatvecs=8000)
    if which == "LM":
        exp = d[np.argsort(-np.abs(d))][:5]
    elif which == "SR":
        exp = d[np.argsort(d.real)][:5]
    else:
        exp = d[np.argsort(-d.real)][:5]
    assert _match(vals, exp) < 1e-8 * np.abs(d).max()
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7 * np.abs(d).max()


def test_skew_symmetric_real():
    rng = np.random.default_rng(1)
    S = rng.normal(size=(80, 80))
    S = S - S.T
    sd = np.linalg.eigvals(S)
    vals, vecs = eigs(S, k=4, which="LM", tol=1e-9, maxMatvecs=8000)
    exp = sd[np.argsort(-np.abs(sd))][:4]
    assert _match(vals, exp) < 1e-6 * np.abs(sd).max()


def test_normal_interior(normal_matrix):
    A, d = normal_matrix
    target = d[np.argsort(np.abs(d))][len(d) // 2]
    # closest in modulus to a point in the spectrum's interior
    # interior normal targets converge slowly; the budgeted run ends
    # ~1e-6 accurate (asserted below), above the nominal 1e-9 ask —
    # opt out of the raise-on-unconverged default and check accuracy
    vals, _ = eigs(A, k=3, which="SM", sigma=0.5, tol=1e-9,
                   maxMatvecs=10000, raise_for_unconverged=False)
    exp = d[np.argsort(np.abs(d - 0.5))][:3]
    assert _match(vals, exp) < 1e-6 * np.abs(d).max()


def test_normal_jdqmr(normal_matrix):
    """JD inner-outer (projected block GMRES) on a normal operator — a
    capability the reference lacks (its inner_solve exists only for the
    Hermitian kind, src/eigs/correction.c:464)."""
    A, d = normal_matrix
    vals, vecs, st = eigs(A, k=4, which="LM", tol=1e-9, method="JDQMR",
                          maxMatvecs=20000, return_stats=True)
    exp = d[np.argsort(-np.abs(d))][:4]
    assert _match(vals, exp) < 1e-7 * np.abs(d).max()
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * np.abs(d).max()
    assert st["num_inner_iterations"] > 0


def test_normal_jdqmr_interior(normal_matrix):
    """Interior normal-operator solve with the GMRES correction. Interior
    shifted operators are GMRES-hostile without a preconditioner, so a
    shallow inner depth is the right setting (the correction then acts as
    a few-step Krylov-accelerated GD); the reference cannot run this
    configuration at all (src/eigs/correction.c:464)."""
    A, d = normal_matrix
    sigma = 0.5
    exp = d[np.argsort(np.abs(d - sigma))][:2]
    vals, _, st = eigs(A, k=2, which="SM", sigma=sigma, tol=1e-8,
                       method="JDQMR", maxInnerIterations=4,
                       maxMatvecs=40000, return_stats=True)
    assert _match(vals, exp) < 1e-3 * np.abs(d).max()
    assert st["num_inner_iterations"] > 0


def test_normal_locking_blocks(normal_matrix):
    """Hard locking + blocked solve on KIND(N) — the Hermitian surface's
    axes exercised on the normal path."""
    A, d = normal_matrix
    vals, vecs, st = eigs(A, k=8, which="LM", tol=1e-9, locking=True,
                          maxBlockSize=2, maxMatvecs=20000,
                          return_stats=True)
    exp = d[np.argsort(-np.abs(d))][:8]
    assert _match(vals, exp) < 1e-7 * np.abs(d).max()
    assert st["num_locked"] > 0
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * np.abs(d).max()


def test_normal_ortho_const_deflated_resume(normal_matrix):
    """numOrthoConst on KIND(N): constrain a second solve to the first
    solve's eigenvectors and get the NEXT largest-modulus values."""
    A, d = normal_matrix
    v1, x1 = eigs(A, k=3, which="LM", tol=1e-10, maxMatvecs=8000)
    v2, x2 = eigs(A, k=3, which="LM", tol=1e-10, maxMatvecs=12000,
                  lock=x1)
    order = np.argsort(-np.abs(d))
    assert _match(v1, d[order][:3]) < 1e-8 * np.abs(d).max()
    assert _match(v2, d[order][3:6]) < 1e-7 * np.abs(d).max()
    assert np.abs(x1.conj().T @ x2).max() < 1e-6


def test_normal_cgt_clt():
    """closest_geq/leq on complex Ritz values: ordered by REAL part
    relative to sigma (the total order consistent with the Hermitian
    definition; modulus admits no geq/leq). Rotation-block normal matrix
    with well-separated real parts so the interior-style target resolves
    the nearest conjugate pair."""
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    a = np.linspace(-1.0, 1.0, 30)          # separated real parts
    b = 0.2 + 0.1 * rng.random(30)
    blocks = [np.array([[a[j], b[j]], [-b[j], a[j]]]) for j in range(30)]
    A = sp.block_diag(blocks).tocsr()
    d = np.concatenate([a + 1j * b, a - 1j * b])
    sigma = 0.25
    vals, _ = eigs(A, k=2, which="CGT", sigma=sigma, tol=1e-9,
                   maxMatvecs=40000, raise_for_unconverged=False)
    geq = d[d.real >= sigma]
    exp = geq[np.argsort(geq.real - sigma)][:2]
    assert _match(vals, exp) < 1e-6 * np.abs(d).max()
    vals2, _ = eigs(A, k=2, which="CLT", sigma=sigma, tol=1e-9,
                    maxMatvecs=40000, raise_for_unconverged=False)
    leq = d[d.real <= sigma]
    exp2 = leq[np.argsort(sigma - leq.real)][:2]
    assert _match(vals2, exp2) < 1e-6 * np.abs(d).max()


def test_normal_n2k():
    """KIND(N) at n=2048 (breadth: the reference's normal surface runs
    at its tests' full problem sizes)."""
    rng = np.random.default_rng(9)
    n = 2048
    # normal-by-construction without a dense n^2 eigendecomposition:
    # block-diagonal rotation blocks give conjugate eigenpairs
    # a_j +- i b_j; a sparse orthogonal similarity keeps matvecs cheap
    import scipy.sparse as sp
    a = rng.normal(size=n // 2) * 2.0
    b = np.abs(rng.normal(size=n // 2)) * 2.0
    blocks = [np.array([[a[j], b[j]], [-b[j], a[j]]])
              for j in range(n // 2)]
    A = sp.block_diag(blocks).tocsr()
    d = np.concatenate([a + 1j * b, a - 1j * b])
    # k even: |.| is 2-fold degenerate on conjugate pairs, so an odd k
    # legitimately returns either member at the cut
    vals, vecs = eigs(A, k=6, which="LM", tol=1e-9, maxMatvecs=30000)
    exp = d[np.argsort(-np.abs(d))][:6]
    assert _match(vals, exp) < 1e-7 * np.abs(d).max()
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * np.abs(d).max()


def test_core_entry_real_storage_promoted():
    """solve_eigs(hermitian=False) with a real operator dtype must
    promote the basis storage to complex (KIND(N) Ritz vectors are
    complex; previously a trace-time lax.cond dtype mismatch)."""
    import jax.numpy as jnp
    from primme_tpu.core.solver import solve_eigs
    from primme_tpu.params import PrimmeParams, resolve_defaults
    from primme_tpu.operators import aslinearoperator

    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.normal(size=(40, 40)))
    d = np.sort(rng.normal(size=40))
    An = Q @ np.diag(d) @ Q.T     # symmetric => normal, real storage
    p = resolve_defaults(PrimmeParams(n=40, num_evals=3, eps=1e-9,
                                      hermitian=False))
    r = solve_eigs(aslinearoperator(np.asarray(An)), p)
    assert jnp.issubdtype(r.evecs.dtype, jnp.complexfloating)
    got = np.sort(np.asarray(r.evals).real)
    assert np.abs(got - d[:3]).max() < 1e-7
