"""Test-harness capabilities: golden-solution writing (the reference's
``driver.saveXFile``, ``tests/COMMON/ioandtest.c:210,412``) and the
config-file CLI driver (``tests/driver.c`` analogue)."""

import numpy as np
import pytest

from primme_tpu.testharness import (read_sol_evecs, write_sol_evecs,
                                    read_sol_svecs, write_sol_svecs)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_sol_evecs_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(37, 5)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        X = X + 1j * rng.normal(size=X.shape)
    p = str(tmp_path / "sol")
    write_sol_evecs(p, X)
    Y = read_sol_evecs(p)
    assert Y.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(X, Y)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_sol_svecs_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(1)
    U = rng.normal(size=(23, 4)).astype(dtype)
    V = rng.normal(size=(17, 4)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        U = U + 1j * rng.normal(size=U.shape)
        V = V + 1j * rng.normal(size=V.shape)
    p = str(tmp_path / "solsvds")
    write_sol_svecs(p, U, V)
    U2, V2 = read_sol_svecs(p)
    np.testing.assert_array_equal(U, U2)
    np.testing.assert_array_equal(V, V2)


def _write_config(tmp_path, mtx_name, save_name=None, check_name=None):
    lines = [
        f"driver.matrixFile    = {mtx_name}",
        "driver.PrecChoice    = noprecond",
        "primme.numEvals = 3",
        "primme.eps = 1.000000e-09",
        "primme.maxBasisSize = 20",
        "primme.maxMatvecs = 4000",
        "primme.target = primme_largest",
        "method               = PRIMME_GD_Olsen_plusK",
    ]
    if save_name:
        lines.insert(1, f"driver.saveXFile     = {save_name}")
    if check_name:
        lines.insert(1, f"driver.checkXFile    = {check_name}")
    cfg = tmp_path / "test_cfg"
    cfg.write_text("\n".join(lines) + "\n")
    return str(cfg)


def _write_matrix(tmp_path):
    import scipy.io as sio
    import scipy.sparse as sp
    rng = np.random.default_rng(2)
    n = 60
    d = np.sort(rng.uniform(1.0, 10.0, size=n))
    # tridiagonal symmetric: well-separated extremes
    A = sp.diags([np.full(n - 1, 0.3), d, np.full(n - 1, 0.3)],
                 [-1, 0, 1]).tocsr()
    sio.mmwrite(str(tmp_path / "mat.mtx"), A)
    return A


def test_driver_cli_save_and_check(tmp_path, capsys):
    """End-to-end: CLI solves a config, saves the solution in the golden
    binary format, and a second run verifies against that golden file —
    the reference's saveXFile -> checkXFile regeneration loop."""
    from primme_tpu import driver

    A = _write_matrix(tmp_path)
    save = str(tmp_path / "sol_new")
    cfg = _write_config(tmp_path, "mat.mtx", save_name=save)
    rc = driver.main([cfg, "--base-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "solution check: OK" in out
    assert "Eval[3]" in out

    # saved file is a valid golden: read back, verify it IS the solution
    X = read_sol_evecs(save)
    assert X.shape == (60, 3)
    evals_true = np.linalg.eigvalsh(A.toarray())[-3:]
    rq = np.diag(X.T @ (A @ X))
    np.testing.assert_allclose(np.sort(rq), evals_true, rtol=1e-8)

    # second run checks against the golden we just wrote (checkXFile has
    # no dtype suffix in configs; the harness appends _double)
    import shutil
    shutil.copy(save, save + "_double")
    cfg2 = _write_config(tmp_path, "mat.mtx", check_name="sol_new")
    rc2 = driver.main([cfg2, "--base-dir", str(tmp_path)])
    assert rc2 == 0


def test_driver_cli_svds(tmp_path, capsys):
    from primme_tpu import driver
    import scipy.io as sio
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    B = sp.random(40, 25, density=0.3, random_state=7, format="csr")
    sio.mmwrite(str(tmp_path / "rectsmall.mtx"), B)
    save = str(tmp_path / "sol_svds_new")
    cfg = tmp_path / "test_svds_cfg"
    cfg.write_text("\n".join([
        "driver.matrixFile    = rectsmall.mtx",
        f"driver.saveXFile     = {save}",
        "driver.PrecChoice    = noprecond",
        "primme_svds.numSvals = 2",
        "primme_svds.eps = 1e-8",
        "primme_svds.target = primme_svds_largest",
        "method = primme_svds_hybrid",
    ]) + "\n")
    rc = driver.main([str(cfg), "--base-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "Sval[2]" in out
    U, V = read_sol_svecs(save)
    assert U.shape == (40, 2) and V.shape == (25, 2)
    s_true = np.linalg.svd(B.toarray(), compute_uv=False)[:2]
    s_rq = np.linalg.norm(np.asarray(B @ V), axis=0)
    np.testing.assert_allclose(np.sort(s_rq), np.sort(s_true), rtol=1e-7)
