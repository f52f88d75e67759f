"""End-to-end eigsh tests vs scipy ground truth.

Models the reference's binding-level test strategy (``Python/tests.py``,
SURVEY.md §4.4): parametrized sweeps over dtypes, targets, methods, and
problem kinds, comparing against dense ``scipy.linalg.eigh``."""

import numpy as np
import pytest
import scipy.linalg as sla
import scipy.sparse as sp

from primme_tpu import eigsh, Method


@pytest.fixture(scope="module")
def tridiag():
    n = 300
    d = np.linspace(1, 100, n)
    A = sp.diags([d, 0.3 * np.ones(n - 1), 0.3 * np.ones(n - 1)],
                 [0, 1, -1]).tocsr()
    return A, np.linalg.eigvalsh(A.toarray())


def assert_close(vals, expect, tol=1e-7):
    scale = max(1.0, float(np.abs(expect).max()))
    err = np.abs(np.sort(vals) - np.sort(expect)).max()
    assert err < tol * scale, f"err={err:.3e}"


@pytest.mark.parametrize("which", ["SA", "LA"])
@pytest.mark.parametrize("method", [Method.GD_Olsen_plusK, Method.GD_plusK,
                                    Method.GD])
def test_extreme(tridiag, which, method):
    A, ref = tridiag
    vals, vecs = eigsh(A, k=5, which=which, tol=1e-9, method=method,
                       raise_for_unconverged=False)
    expect = ref[:5] if which == "SA" else ref[-5:]
    assert_close(vals, expect)
    # residuals
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-8 * ref[-1] * 100


def test_hard_locking_many_pairs(tridiag):
    A, ref = tridiag
    vals, vecs, st = eigsh(A, k=30, which="SA", tol=1e-9, ncv=20,
                           method=Method.GD_Olsen_plusK, return_stats=True,
                           maxMatvecs=6000, raise_for_unconverged=False)
    assert_close(vals, ref[:30])
    G = vecs.T @ vecs
    assert np.abs(G - np.eye(30)).max() < 1e-10
    assert st["num_locked"] >= 25


def test_interior(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A, k=5, which="SM", sigma=50.0, tol=1e-9,
                    method=Method.GD_plusK, raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - 50.0))][:5]
    assert_close(vals, expect)


def test_numeric_which(tridiag):
    """Reference parity (primme.pyx:530-538): a numeric `which` targets
    eigenvalues closest to that value; combining it with sigma is an
    error."""
    A, ref = tridiag
    vals, _ = eigsh(A, k=3, which=50.0, tol=1e-9,
                    method=Method.GD_plusK, raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - 50.0))][:3]
    assert_close(vals, expect)
    with pytest.raises(ValueError):
        eigsh(A, k=3, which=50.0, sigma=1.0)
    with pytest.raises(ValueError):
        eigsh(A, k=3, which="bogus")


def test_complex_hermitian():
    rng = np.random.default_rng(3)
    n = 150
    H = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    H = (H + H.conj().T) / 2 + np.diag(np.linspace(0, 50, n))
    ref = np.linalg.eigvalsh(H)
    vals, vecs = eigsh(H, k=5, which="SA", tol=1e-9,
                       raise_for_unconverged=False)
    assert_close(vals, ref[:5])


def test_generalized():
    rng = np.random.default_rng(4)
    n = 120
    B = sp.diags(1.0 + rng.random(n)).tocsr()
    A = sp.diags([np.linspace(1, 60, n), 0.2 * np.ones(n - 1),
                  0.2 * np.ones(n - 1)], [0, 1, -1]).tocsr()
    ref = sla.eigh(A.toarray(), B.toarray(), eigvals_only=True)
    vals, vecs = eigsh(A, k=5, M=B, which="SA", tol=1e-9,
                       raise_for_unconverged=False)
    assert_close(vals, ref[:5])
    G = vecs.T @ (B @ vecs)
    assert np.abs(G - np.eye(5)).max() < 1e-8


def test_block(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A, k=10, which="SA", tol=1e-9, maxBlockSize=4,
                    method=Method.GD_Olsen_plusK,
                    raise_for_unconverged=False)
    assert_close(vals, ref[:10], tol=1e-6)


def test_lobpcg_preset(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A, k=8, which="SA", tol=1e-8,
                    method=Method.LOBPCG_OrthoBasis,
                    raise_for_unconverged=False)
    assert_close(vals, ref[:8], tol=1e-6)


def test_jacobi_precond_cuts_matvecs(tridiag):
    """Preconditioning must cut the SOLVE matvecs (probe matvecs are a
    fixed verification overhead independent of K — compare net of
    num_probe_matvecs)."""
    A, ref = tridiag
    _, _, st_p = eigsh(A, k=5, which="SA", tol=1e-9, jacobi=True,
                       method=Method.GD_Olsen_plusK, return_stats=True,
                       raise_for_unconverged=False)
    _, _, st_n = eigsh(A, k=5, which="SA", tol=1e-9,
                       method=Method.GD_Olsen_plusK, return_stats=True,
                       raise_for_unconverged=False)
    solve_p = st_p["num_matvecs"] - st_p["num_probe_matvecs"]
    solve_n = st_n["num_matvecs"] - st_n["num_probe_matvecs"]
    assert solve_p < solve_n / 2


def test_chebyshev_precond():
    """Polynomial (Chebyshev) preconditioner — the TPU-native ILUT-class
    option (reference capability bar: tests/COMMON/ilut.f). On a 2D
    Laplacian the diagonal is constant, so Jacobi is a no-op scalar;
    Chebyshev must cut outer matvecs by well over 2x."""
    m = 24
    T = sp.diags([np.full(m - 1, -1.), np.full(m, 2.),
                  np.full(m - 1, -1.)], [-1, 0, 1])
    Iden = sp.eye(m)
    A = (sp.kron(T, Iden) + sp.kron(Iden, T)).tocsr()
    truth = np.sort(np.linalg.eigvalsh(A.toarray()))[:4]

    # verify_spectrum=0: this test measures preconditioner effectiveness
    # (outer matvec counts); the verification probe adds a roughly equal
    # absolute cost to both sides and would wash out the ratio.
    _, _, st_j = eigsh(A, k=4, which="SA", tol=1e-9, jacobi=True,
                       return_stats=True, raise_for_unconverged=False,
                       verify_spectrum=0)
    from primme_tpu import ChebyshevPrecond
    K = ChebyshevPrecond.from_operator(A, degree=10)
    # maxBlockSize >= multiplicity: the 2D Laplacian spectrum is full of
    # (i,j)/(j,i) twins, and with a filter this strong a single-vector
    # block converges the next distinct value before the twin re-emerges
    # (same remedy the reference documents for multiple eigenvalues)
    vals, vecs, st_c = eigsh(A, k=4, which="SA", tol=1e-9, OPinv=K,
                             maxBlockSize=2, verify_spectrum=0,
                             return_stats=True, raise_for_unconverged=False)
    assert_close(np.sort(vals), truth, tol=1e-8)
    assert st_c["num_matvecs"] * 2 < st_j["num_matvecs"]
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7


def test_stats_parity(tridiag):
    """primme_stats parity (include/primme_eigs.h:109-135): comm-volume
    counters, VWXR flops, spectrum-range estimates, and the host-timed
    per-category breakdown."""
    A, ref = tridiag
    vals, _, st = eigsh(A, k=4, which="SA", tol=1e-9, jacobi=True,
                        return_stats=True, time_breakdown=True,
                        raise_for_unconverged=False)
    assert st["num_global_sum"] > 0
    assert st["volume_global_sum"] >= st["num_global_sum"]
    assert st["flops_dense"] > 0 and st["num_ortho_inner_prods"] > 0
    assert st["num_broadcast"] == 0 and st["volume_broadcast"] == 0
    # range estimates bracket the found eigenvalues
    assert st["est_min_eval"] <= vals.min() + 1e-6
    assert st["est_max_eval"] >= vals.max() - 1e-6
    assert st["est_max_eval"] <= ref.max() + 1.0
    # time breakdown: non-negative, categories sum to <= elapsed
    tsum = (st["time_matvec"] + st["time_precond"] + st["time_ortho"]
            + st["time_dense"])
    assert all(st[k] >= 0 for k in
               ("time_matvec", "time_precond", "time_ortho", "time_dense",
                "time_other"))
    assert st["time_precond"] > 0          # jacobi ran
    assert tsum <= st["elapsed_time"] + 1e-9 + st["time_other"]


def test_float32(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A.astype(np.float32), k=4, which="SA", tol=1e-4,
                    raise_for_unconverged=False)
    assert_close(vals, ref[:4], tol=1e-3)


@pytest.mark.parametrize("half", ["bfloat16", "float16"])
def test_half_precision_basis(tridiag, half):
    """Half-precision working basis (the reference's half kind,
    src/include/template_types.h:40-150; on TPU the native dtype is
    bf16). The basis is stored in half, small dense algebra runs in f32
    against the explicit V^H V Gram (orth=explicit_I,
    src/eigs/primme_c.c:304-319). Accuracy floors at ~eps(half)*||A||."""
    import jax.numpy as jnp

    A, ref = tridiag
    anorm = np.abs(ref).max()
    dt = jnp.dtype(half)
    tol = 4 * float(jnp.finfo(dt).eps)
    vals, vecs, st = eigsh(A.astype(np.float32), k=3, which="SA", tol=tol,
                           dtype=dt, return_stats=True,
                           raise_for_unconverged=False)
    assert vals.dtype == np.float32 and vecs.dtype == np.float32
    R = A @ vecs - vecs * vals[None, :]
    floor = 16 * float(jnp.finfo(dt).eps)   # ~6e-2 bf16, ~1.6e-2 f16
    assert np.linalg.norm(R, axis=0).max() < floor * anorm
    # each returned value is a true eigenvalue to the storage resolution
    assert np.abs(ref[None, :] - vals[:, None]).min(axis=1).max() \
        < floor * anorm


def test_deflation_constraints(tridiag):
    A, ref = tridiag
    w, v = np.linalg.eigh(A.toarray())
    vals, _ = eigsh(A, k=3, which="SA", tol=1e-9, lock=v[:, :2],
                    raise_for_unconverged=False)
    assert_close(vals, ref[2:5])


def test_v0_initial_guess(tridiag):
    A, ref = tridiag
    w, v = np.linalg.eigh(A.toarray())
    _, _, st = eigsh(A, k=2, which="SA", tol=1e-9,
                     v0=v[:, :2] + 1e-3 * np.random.default_rng(0).normal(
                         size=(A.shape[0], 2)),
                     return_stats=True, raise_for_unconverged=False)
    _, _, st0 = eigsh(A, k=2, which="SA", tol=1e-9, return_stats=True,
                      raise_for_unconverged=False)
    assert st["num_matvecs"] < st0["num_matvecs"]


def test_return_shapes(tridiag):
    A, ref = tridiag
    vals = eigsh(A, k=3, which="SA", tol=1e-8,
                 return_eigenvectors=False, raise_for_unconverged=False)
    assert vals.shape == (3,)


@pytest.mark.parametrize("method", [Method.JDQMR, Method.JDQMR_ETol])
def test_jdqmr(tridiag, method):
    A, ref = tridiag
    vals, vecs, st = eigsh(A, k=5, which="SA", tol=1e-9, method=method,
                           return_stats=True, maxMatvecs=5000,
                           raise_for_unconverged=False)
    assert_close(vals, ref[:5])
    assert st["num_inner_iterations"] > 0


def test_jdqmr_preconditioned(tridiag):
    A, ref = tridiag
    vals, _, st = eigsh(A, k=5, which="SA", tol=1e-9,
                        method=Method.JDQMR_ETol, jacobi=True,
                        return_stats=True, maxMatvecs=5000,
                        raise_for_unconverged=False)
    assert_close(vals, ref[:5])
    assert st["num_matvecs"] < 400


def test_jdqmr_interior(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A, k=5, which="SM", sigma=50.0, tol=1e-9,
                    method=Method.JDQMR, maxMatvecs=8000,
                    raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - 50.0))][:5]
    assert_close(vals, expect, tol=1e-6)


@pytest.mark.parametrize("proj", ["refined", "harmonic"])
def test_projections_interior(tridiag, proj):
    A, ref = tridiag
    vals, _ = eigsh(A, k=5, which="SM", sigma=50.0, tol=1e-9,
                    method=Method.GD_plusK, projection=proj,
                    maxMatvecs=6000, raise_for_unconverged=False)
    expect = ref[np.argsort(np.abs(ref - 50.0))][:5]
    assert_close(vals, expect, tol=1e-6)


def test_refined_extreme(tridiag):
    A, ref = tridiag
    vals, _ = eigsh(A, k=5, which="SA", tol=1e-9, projection="refined",
                    method=Method.GD_plusK, maxMatvecs=3000,
                    raise_for_unconverged=False)
    assert_close(vals, ref[:5])


def test_dynamic_method(tridiag):
    A, ref = tridiag
    vals, _, st = eigsh(A, k=5, which="SA", tol=1e-9, method=Method.DYNAMIC,
                        return_stats=True, maxMatvecs=5000,
                        raise_for_unconverged=False)
    assert_close(vals, ref[:5])


def test_monitor_event_taxonomy(tridiag):
    """Monitor event kinds follow the reference primme_event enum
    (include/primme_eigs.h:80-89): 0 outer, 1 inner, 2 restart, 3 reset,
    4 converged, 5 locked; inner iterations are aggregated per expansion."""
    A, ref = tridiag
    events = []

    def mon(event, num_inner, **kw):
        events.append((int(event), int(num_inner)))

    vals, _, st = eigsh(A, k=6, which="SA", tol=1e-10, method="JDQMR",
                        ncv=10, monitor=mon, return_stats=True,
                        raise_for_unconverged=False)
    assert_close(vals, ref[:6])
    kinds = {e for e, _ in events}
    assert kinds <= {0, 1, 2, 3, 4, 5}
    assert 5 in kinds                     # pairs locked
    assert any(e == 1 and ni > 0 for e, ni in events)   # inner iterations
    assert sum(ni for _, ni in events) == st["num_inner_iterations"]

    # soft locking: restarts are not shadowed by lock events
    events.clear()
    eigsh(A, k=6, which="SA", tol=1e-10, method="JDQMR", ncv=10,
          locking=0, monitor=mon, raise_for_unconverged=False)
    assert 2 in {e for e, _ in events}    # restart events (ncv=10)


def test_monitor_inner_iterations(tridiag):
    """Per-inner-iteration events (primme_event_inner_iteration,
    src/eigs/inner_solve.c:491-500): with monitor_inner=True the monitor
    receives the device-recorded QMR trace — one (value, eres, alive)
    row per inner iteration — replayed once per outer iteration (the
    TPU-native shape of the reference's in-loop monitorFun call)."""
    A, ref = tridiag
    rows = []

    def mon(event, num_inner, inner_trace=None, **kw):
        if inner_trace is not None and int(num_inner) > 0:
            tr = np.asarray(inner_trace)
            rows.append((int(num_inner), tr[:min(int(num_inner),
                                                 tr.shape[0])]))

    vals, _, st = eigsh(A, k=4, which="SA", tol=1e-10, method="JDQMR",
                        monitor=mon, monitor_inner=True, return_stats=True,
                        raise_for_unconverged=False)
    assert_close(vals, ref[:4])
    assert rows, "no inner traces delivered"
    total = sum(ni for ni, _ in rows)
    assert total == st["num_inner_iterations"]
    for ni, tr in rows:
        assert tr.ndim == 3 and tr.shape[2] == 3
        # first recorded iteration has at least one alive column and a
        # finite eigenresidual estimate
        assert (tr[0, :, 2] > 0).any()
        alive0 = tr[0, :, 2] > 0
        assert np.isfinite(tr[0, alive0, :2]).all()


def test_dynamic_reprobes_idle_method():
    """DYNAMIC must keep measuring the non-current method (the reference
    updates both cost models every iteration, main_iter.c:2194
    update_statistics); a settled winner must not starve the loser of
    measurements forever."""
    from primme_tpu.core.dynamic import solve_eigs_dynamic
    from primme_tpu.params import PrimmeParams, Target
    from primme_tpu.operators import aslinearoperator

    n = 500
    A = sp.diags([np.full(n - 1, -1.), np.linspace(1., 2., n),
                  np.full(n - 1, -1.)], [-1, 0, 1]).tocsr()
    p = PrimmeParams(n=n, num_evals=10, target=Target.smallest, eps=1e-12,
                     dynamic_method_switch=1)
    trace = []
    res = solve_eigs_dynamic(aslinearoperator(A), p, method_trace=trace)
    ref = np.sort(np.linalg.eigvalsh(A.toarray()))[:10]
    assert np.abs(np.sort(np.asarray(res.evals)) - ref).max() < 1e-8
    # enough segments ran to exercise re-probing, and after the initial
    # exploration the loser still shows up in the measured trace
    assert len(trace) >= 8, trace
    tail = trace[2:]
    assert "gd" in tail and "jd" in tail, trace


def test_mhd1280b_reference():
    """mhd1280b.mtx: complex Hermitian reference matrix (tests/mhd1280b.mtx,
    interior configs test_1??)."""
    import scipy.io as sio

    A = sp.csr_matrix(sio.mmread("/root/reference/tests/mhd1280b.mtx"))
    ref = np.linalg.eigvalsh(A.toarray())
    # largest pairs
    vals, vecs = eigsh(A, k=5, which="LA", tol=1e-10,
                       raise_for_unconverged=False)
    assert_close(vals, ref[-5:], tol=1e-8)


@pytest.mark.parametrize("n,k", [(2, 1), (2, 2), (5, 5), (10, 10), (1, 1)])
def test_edge_sizes(n, k):
    """k = n and tiny-n edge cases (the reference sweeps these in its
    combinatorial interface tests, tests/Makefile:146-180)."""
    rng = np.random.default_rng(n * 10 + k)
    A = rng.normal(size=(n, n))
    A = (A + A.T) / 2
    ref = np.linalg.eigvalsh(A)
    vals, _ = eigsh(A, k=k, which="SA", tol=1e-10,
                    raise_for_unconverged=False)
    assert np.abs(np.sort(vals) - ref[:k]).max() < 1e-8


def test_mixed_precision_work_dtype(tridiag):
    """internalPrecision analogue: f64 input, f32 working precision
    (primme_op_datatype, include/primme_eigs.h:100-107)."""
    A, ref = tridiag
    vals, vecs = eigsh(A, k=4, which="SA", tol=1e-4, dtype=np.float32,
                       raise_for_unconverged=False)
    assert vals.dtype == np.float32
    assert_close(vals, ref[:4], tol=1e-3)


def test_identity_multiplicity_no_hang():
    """Degenerate spectrum: every subspace invariant; locking must refill
    the basis instead of entering the empty-basis absorbing state."""
    n, k = 40, 12
    A = np.eye(n)
    vals, vecs = eigsh(A, k=k, which="SA", tol=1e-10, maxiter=3000,
                       raise_for_unconverged=False)
    assert np.abs(vals - 1.0).max() < 1e-8
    G = vecs.T @ vecs
    assert np.abs(G - np.eye(k)).max() < 1e-8


def test_span_exhaustion_no_fake_pairs():
    """Basis + locked vectors exhaust R^n: collapsed expansion directions
    must not enter the basis as zero columns (fake eigenvalue-0 pairs)."""
    rng = np.random.default_rng(11)
    n, k = 20, 10
    A = rng.normal(size=(n, n))
    A = A @ A.T + np.eye(n)  # SPD, eigenvalues >= 1
    ref = np.linalg.eigvalsh(A)
    vals, vecs = eigsh(A, k=k, which="SA", tol=1e-10, ncv=15,
                       maxiter=4000, raise_for_unconverged=False)
    assert np.min(vals) > 0.5, f"fake zero pair: {vals}"
    assert np.abs(np.sort(vals) - ref[:k]).max() < 1e-7 * ref[-1]


def test_init_basis_mode_user(tridiag):
    """primme_init_user (init.c:193-196): the initial basis is the user
    guesses padded with random vectors up to maxBlockSize — no Krylov
    fill. With exact eigenvector guesses this converges almost
    immediately; krylov mode from the same guesses does more work."""
    from primme_tpu.core.solver import solve_eigs, setup_solver, make_config
    from primme_tpu.params import (PrimmeParams, Target, InitBasisMode,
                                   resolve_defaults)
    from primme_tpu.operators import aslinearoperator
    import jax.numpy as jnp

    A, ref = tridiag
    w, v = np.linalg.eigh(A.toarray())
    # verify_spectrum=0: this test measures the matvec cost of the init
    # mode itself; the spectrum-verification probe would add a (correct
    # but budgeted) extra-pair solve on top.
    p = PrimmeParams(n=A.shape[0], num_evals=2, target=Target.smallest,
                     eps=1e-10, init_basis_mode=InitBasisMode.user,
                     verify_spectrum=0)
    p = resolve_defaults(p)
    cfg = make_config(p)
    assert cfg.init_user
    res = solve_eigs(aslinearoperator(A), p,
                     v0=jnp.asarray(v[:, :2], jnp.float64))
    assert np.abs(np.sort(np.asarray(res.evals)) - ref[:2]).max() < 1e-8
    # exact guesses: both pairs converge within a few outer iterations
    assert int(res.stats.num_matvecs) <= 40


def test_b_norm_inv_b_norm_plumbing(tridiag):
    """BNorm/invBNorm (auxiliary_eigs.c:567,625): accepted through the
    reflection surface and consumed as the generalized problem norm."""
    from primme_tpu.params import PrimmeParams, set_member, get_member
    from primme_tpu.core.solver import make_config

    p = PrimmeParams(n=10, num_evals=1)
    p = set_member(p, "BNorm", 4.0)
    p = set_member(p, "invBNorm", 0.5)
    assert get_member(p, "b_norm") == 4.0
    cfg = make_config(p)
    assert cfg.b_norm == 4.0 and cfg.inv_b_norm == 0.5


def test_segmented_solve_bit_identical():
    """solve_eigs(segment_outer=N) re-enters the jitted loop from the host
    and must produce exactly the unsegmented result (the driver for very
    long solves, e.g. the 128^3 k=100 bench)."""
    import numpy as np
    import jax.numpy as jnp
    from primme_tpu import PrimmeParams, Method, set_method
    from primme_tpu.core.solver import solve_eigs
    from primme_tpu.operators import DenseOperator

    rng = np.random.default_rng(3)
    n = 180
    Ad = np.diag(np.arange(1.0, n + 1)) + 0.02 * rng.normal(size=(n, n))
    Ad = (Ad + Ad.T) / 2
    A = DenseOperator(jnp.asarray(Ad))
    p = PrimmeParams(n=n, num_evals=5, eps=1e-10, max_basis_size=20,
                     max_block_size=2, max_matvecs=6000, locking=1)
    p = set_method(Method.GD_Olsen_plusK, p, has_precond=False)
    r1 = solve_eigs(A, p, dtype=jnp.float64)
    r2 = solve_eigs(A, p, dtype=jnp.float64, segment_outer=5)
    np.testing.assert_array_equal(np.asarray(r1.evals), np.asarray(r2.evals))
    np.testing.assert_array_equal(np.asarray(r1.resnorms),
                                  np.asarray(r2.resnorms))
    assert int(r1.stats.num_matvecs) == int(r2.stats.num_matvecs)
    truth = np.sort(np.linalg.eigvalsh(Ad))[:5]
    assert np.abs(np.sort(np.asarray(r2.evals)) - truth).max() < 1e-8


def test_profile_event_stream():
    """primme.profile parity (common.h:355-398): profile=regex selects
    named scopes and reports each through the monitor as a
    primme_event_profile (7) event with its measured device self-time;
    stats['profile'] carries the same table."""
    import scipy.sparse as sp
    n = 400
    A = sp.diags([np.linspace(1, 40, n), 0.4 * np.ones(n - 1),
                  0.4 * np.ones(n - 1)], [0, 1, -1]).tocsr()
    events = []

    def mon(event, *args, msg=None, time=None, **kw):
        if int(event) == 7:
            events.append((msg, time))

    from primme_tpu import eigsh
    _, _, st = eigsh(A, k=4, which="SA", tol=1e-8, jacobi=True,
                     return_stats=True, monitor=mon,
                     profile=r"matvec|ortho")
    names = {m for m, _ in events}
    assert names == {"pt_matvec", "pt_ortho"}, names
    assert set(st["profile"]) == {"pt_matvec", "pt_ortho"}
    assert all(t >= 0.0 for _, t in events)
    # a non-matching regex selects nothing
    _, _, st2 = eigsh(A, k=4, which="SA", tol=1e-8, return_stats=True,
                      profile=r"nomatch_xyz")
    assert st2["profile"] == {}


def test_keyword_forwarding_reflection_labels(tridiag):
    """Unknown eigsh kwargs are primme_params labels routed through the
    reflection layer AFTER the preset (primme.pyx:1446 parity); labels
    that would desync the configuration from the operator are refused."""
    A, ref = tridiag
    # a forwarded label reaches the solver config: cap the basis via the
    # reflection route and confirm through stats
    vals, _, st = eigsh(A, k=3, which="SA", tol=1e-8, return_stats=True,
                        maxBasisSize=12, restarting_maxPrevRetain=1)
    assert_close(vals, ref[:3])
    for bad_kw in ({"n": 300}, {"numEvals": 5}, {"target": "primme_largest"},
                   {"numOrthoConst": 1}, {"hermitian": False}):
        with pytest.raises(ValueError):
            eigsh(A, k=3, which="SA", tol=1e-8, **bad_kw)
    # unknown labels still raise KeyError from the reflection layer
    with pytest.raises(KeyError):
        eigsh(A, k=3, which="SA", tol=1e-8, noSuchParameter=7)


def test_large_block_probe_width():
    """maxBlockSize > the probe's 48-column cap must not crash the
    spectrum-verification probe (trace-time _dus shape error before the
    probe width was floored at 2*blk)."""
    n = 300
    A = np.diag(np.linspace(1, 30, n))
    vals, _ = eigsh(A, k=8, which="SA", tol=1e-8, maxBlockSize=50)
    assert_close(vals, np.linspace(1, 30, n)[:8], tol=1e-8)


def test_soft_locking_tight_basis(tridiag):
    """locking=0 with minRestartSize < numEvals: the reference REJECTS
    this (check_input error -33, primme_c.c:507); this framework grows
    the restart size when the basis has room (previously the config
    stalled into give_up with wrong eigenvalues) and raises the
    reference's error when it provably cannot."""
    A, ref = tridiag
    # room to grow: mrs auto-raised to numEvals, converges cleanly
    vals, _ = eigsh(A, k=6, which="SA", tol=1e-9, ncv=8, locking=False)
    assert_close(vals, ref[:6], tol=1e-9)
    vals, _ = eigsh(A, k=2, which="SA", tol=1e-9, ncv=3, locking=False)
    assert_close(vals, ref[:2], tol=1e-9)
    # no room: numEvals + maxBlockSize > maxBasisSize -> reference -33
    with pytest.raises(ValueError, match="-33"):
        eigsh(A, k=6, which="SA", tol=1e-9, ncv=6, locking=False)
