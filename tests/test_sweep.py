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

pytestmark = pytest.mark.slow


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
@pytest.mark.parametrize("sigma", [20.2, 5.7])
def test_sweep_interior(fixture, method, k, sigma):
    A, ref = fixture
    vals, _ = eigsh(A, k=k, which="SM", sigma=sigma, tol=1e-8,
                    method=method, maxMatvecs=6000,
                    raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - sigma))][:k]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} SM k={k}: {err:.2e}"


@pytest.mark.parametrize("method", INTERIOR_METHODS[:6], ids=lambda m: m.name)
@pytest.mark.parametrize("k", [1, 3])
def test_sweep_largest_abs(fixture, method, k):
    """largest_abs (LM with a shift): farthest from sigma in modulus."""
    A, ref = fixture
    sigma = 20.2
    vals, _ = eigsh(A, k=k, which="LM", sigma=sigma, tol=1e-8,
                    method=method, maxMatvecs=6000,
                    raise_for_unconverged=False)
    expect = ref[np.argsort(-np.abs(ref - sigma))][:k]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} LM k={k}: {err:.2e}"


# ---------------------------------------------------------------------------
# Edge sizes: tiny n, k = n, k large relative to n (the reference sweeps
# Laplacian sizes {0..100} x numEvals {0..100} incl. k = n,
# tests/Makefile:146-180)
# ---------------------------------------------------------------------------

def _rand_sym(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return (A + A.T) / 2


_EDGE = sorted({(n, k) for n in (1, 2, 3, 5, 10, 17)
                for k in (1, max(1, n // 2), max(1, n - 1), n)})


@pytest.mark.parametrize("n,k", _EDGE, ids=lambda v: str(v))
@pytest.mark.parametrize("which", ["SA", "LA"])
def test_sweep_edge_sizes(n, k, which):
    A = _rand_sym(n, 100 * n + k)
    ref = np.linalg.eigvalsh(A)
    vals, vecs = eigsh(A, k=k, which=which, tol=1e-10,
                       raise_for_unconverged=False)
    expect = ref[:k] if which == "SA" else ref[-k:]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-7 * max(1.0, np.abs(ref).max()), f"n={n} k={k}: {err:.2e}"
    G = vecs.T @ vecs
    assert np.abs(G - np.eye(k)).max() < 1e-7


@pytest.mark.parametrize("k,ncv", [(7, 8), (7, 9), (20, 22), (40, 48)])
def test_sweep_k_near_basis(fixture, k, ncv):
    """k = maxBasisSize-1 and other tight-basis ratios."""
    A, ref = fixture
    vals, _ = eigsh(A, k=k, which="SA", tol=1e-8, ncv=ncv,
                    maxMatvecs=40000, raise_for_unconverged=False)
    err = np.abs(np.sort(vals) - ref[:k]).max()
    assert err < 1e-6 * 40, f"k={k} ncv={ncv}: {err:.2e}"


@pytest.mark.parametrize("k", [40, 78, 80])
def test_sweep_k_near_n(fixture, k):
    """k approaching / equal to n (the reference sweeps k = n)."""
    A, ref = fixture
    vals, _ = eigsh(A, k=k, which="SA", tol=1e-8, maxMatvecs=60000,
                    raise_for_unconverged=False)
    err = np.abs(np.sort(vals) - ref[:k]).max()
    assert err < 1e-6 * 40, f"k={k}: {err:.2e}"


# ---------------------------------------------------------------------------
# Projection (extraction) axis: RR / harmonic / refined x method class
# (the reference sweeps projections, tests/Makefile:146-180)
# ---------------------------------------------------------------------------

_PROJ_METHODS = [Method.GD_plusK, Method.GD_Olsen_plusK, Method.JDQMR]


@pytest.mark.parametrize("method", _PROJ_METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("projection", ["RR", "harmonic", "refined"])
@pytest.mark.parametrize("mode", ["extreme", "interior"])
def test_sweep_projections(fixture, method, projection, mode):
    A, ref = fixture
    if mode == "extreme":
        if projection != "RR":
            # harmonic/refined are interior tools; exercised with a shift
            # at the spectrum edge instead of an extreme target
            sigma = 0.0
            vals, _ = eigsh(A, k=3, which="SM", sigma=sigma, tol=1e-8,
                            method=method, projection=projection,
                            maxMatvecs=9000, raise_for_unconverged=False)
            expect = ref[np.argsort(np.abs(ref - sigma))][:3]
        else:
            vals, _ = eigsh(A, k=3, which="SA", tol=1e-8, method=method,
                            projection=projection, maxMatvecs=9000,
                            raise_for_unconverged=False)
            expect = ref[:3]
    else:
        sigma = 20.2
        vals, _ = eigsh(A, k=3, which="SM", sigma=sigma, tol=1e-8,
                        method=method, projection=projection,
                        maxMatvecs=9000, raise_for_unconverged=False)
        expect = ref[np.argsort(np.abs(ref - sigma))][:3]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} {projection} {mode}: {err:.2e}"


# ---------------------------------------------------------------------------
# Degenerate spectrum (the headline failure class: multiplicity > blockSize)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def degenerate_fixture():
    # eigenvalues 1,2,2,2,3,3,3,4,... (3-fold clusters), random basis
    n = 60
    vals = np.repeat(np.arange(1.0, 21.0), 3)[:n]
    rng = np.random.default_rng(7)
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A = (Q * vals[None, :]) @ Q.T
    return (A + A.T) / 2, np.sort(vals)


_DEGEN_METHODS = [Method.GD_Olsen_plusK, Method.JDQMR_ETol,
                  Method.LOBPCG_OrthoBasis, Method.STEEPEST_DESCENT]


@pytest.mark.parametrize("method", _DEGEN_METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("k", [4, 7])
@pytest.mark.parametrize("blk", [1, 2])
def test_sweep_degenerate(degenerate_fixture, method, k, blk):
    """SET equality on a 3-fold-degenerate spectrum with blockSize below
    the multiplicity — the spectrum-verification probe must complete the
    clusters (upstream PRIMME fails this class; see test_degenerate)."""
    A, ref = degenerate_fixture
    vals, _ = eigsh(A, k=k, which="SA", tol=1e-9, method=method,
                    maxBlockSize=blk, maxMatvecs=30000,
                    raise_for_unconverged=False)
    err = np.abs(np.sort(vals) - ref[:k]).max()
    assert err < 1e-6 * 20, f"{method} k={k} blk={blk}: {err:.2e}"


# ---------------------------------------------------------------------------
# closest_leq / closest_geq region targets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", [Method.GD_Olsen_plusK, Method.JDQMR],
                         ids=lambda m: m.name)
@pytest.mark.parametrize("which", ["CLT", "CGT"])
@pytest.mark.parametrize("k", [1, 3])
def test_sweep_region_targets(fixture, method, which, k):
    A, ref = fixture
    sigma = 20.2
    vals, _ = eigsh(A, k=k, which=which, sigma=sigma, tol=1e-8,
                    method=method, maxMatvecs=9000,
                    raise_for_unconverged=False)
    if which == "CLT":
        cand = ref[ref <= sigma + 1e-9]
        expect = cand[np.argsort(sigma - cand)][:k]
    else:
        cand = ref[ref >= sigma - 1e-9]
        expect = cand[np.argsort(cand - sigma)][:k]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} {which} k={k}: {err:.2e}"


# ---------------------------------------------------------------------------
# block sizes x methods, generalized pencils, ortho constraints
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", [Method.GD_Olsen_plusK, Method.JDQMR_ETol,
                                    Method.GD_plusK, Method.JD_Olsen_plusK],
                         ids=lambda m: m.name)
@pytest.mark.parametrize("blk", [2, 4])
@pytest.mark.parametrize("which", ["SA", "LA"])
def test_sweep_blocks(fixture, method, blk, which):
    A, ref = fixture
    vals, _ = eigsh(A, k=5, which=which, tol=1e-8, method=method,
                    maxBlockSize=blk, maxMatvecs=9000,
                    raise_for_unconverged=False)
    expect = ref[:5] if which == "SA" else ref[-5:]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} blk={blk} {which}: {err:.2e}"


@pytest.mark.parametrize("method", [Method.GD_Olsen_plusK, Method.GD_plusK,
                                    Method.LOBPCG_OrthoBasis],
                         ids=lambda m: m.name)
@pytest.mark.parametrize("which", ["SA", "LA"])
def test_sweep_generalized(fixture, method, which):
    import scipy.linalg as sla

    A, _ = fixture
    n = A.shape[0]
    B = sp.diags(1.0 + np.linspace(0, 1, n)).tocsr()
    ref = np.sort(sla.eigh(A.toarray(), B.toarray(), eigvals_only=True))
    vals, _ = eigsh(A, k=4, M=B, which=which, tol=1e-8, method=method,
                    maxMatvecs=9000, raise_for_unconverged=False)
    expect = ref[:4] if which == "SA" else ref[-4:]
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < 1e-6 * 40, f"{method} generalized {which}: {err:.2e}"


@pytest.mark.parametrize("method", [Method.GD_Olsen_plusK, Method.JDQMR_ETol],
                         ids=lambda m: m.name)
@pytest.mark.parametrize("nlock", [1, 3])
def test_sweep_ortho_const(fixture, method, nlock):
    """numOrthoConst deflation: lock the known lowest pairs, ask for the
    next k — must return pairs nlock..nlock+k of the full spectrum."""
    A, ref = fixture
    w, V = np.linalg.eigh(A.toarray())
    vals, _ = eigsh(A, k=3, which="SA", tol=1e-8, method=method,
                    lock=V[:, :nlock], maxMatvecs=9000,
                    raise_for_unconverged=False)
    expect = ref[nlock:nlock + 3]
    err = np.abs(np.sort(vals) - expect).max()
    assert err < 1e-6 * 40, f"{method} noc={nlock}: {err:.2e}"
