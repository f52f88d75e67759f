"""C/Fortran API (native/capi.cpp): build the shim + C smoke test and run
it in a subprocess. The C program exercises all entry modes — CSR,
user-matvec callback, the F77 underscore binding, and svds — against the
analytic Laplacian spectrum (the native analogue of
``examples/ex_eigs_dseq.c``)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("make")
                    is None, reason="native toolchain not present")
def test_capi_end_to_end():
    import sysconfig
    if not os.path.exists(os.path.join(sysconfig.get_paths()["include"],
                                       "Python.h")):
        pytest.skip("CPython headers not present")
    r = subprocess.run(["make", "-C", NATIVE, "libprimme_tpu_capi.so",
                        "test_capi"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # the embedded interpreter initializes from the SYSTEM libpython and
    # does not inherit this process's virtualenv — pass the running
    # interpreter's site-packages explicitly so jax/numpy resolve
    purelib = sysconfig.get_paths()["purelib"]
    env = dict(os.environ,
               PYTHONPATH=os.pathsep.join(
                   [REPO, purelib, os.environ.get("PYTHONPATH", "")]),
               JAX_PLATFORMS="cpu")
    # the embedded interpreter must not inherit a TPU platform pin
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([os.path.join(NATIVE, "test_capi")], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CAPI OK" in r.stdout


def test_params_handle_surface_python_level():
    """The Python half of the C parameter ABI, driven in-process: unset
    ``n`` reads back 0 (the reference struct default), never the internal
    replay placeholder; enum-valued svds members round-trip as reference
    constant codes; invalid enum values fail at set time."""
    import numpy as np
    from primme_tpu import capi_support as cs

    h = cs.params_create()
    out = np.zeros(1)
    assert cs.params_get(h, "n", out.ctypes.data) == 0
    assert out[0] == 0.0
    assert cs.params_set(h, "numEvals", "3") == 0
    assert cs.params_get(h, "n", out.ctypes.data) == 0
    assert out[0] == 0.0                      # still unset, not 2^30
    assert cs.params_set(h, "n", "500") == 0
    assert cs.params_get(h, "n", out.ctypes.data) == 0
    assert out[0] == 500.0
    assert cs.params_free(h) == 0

    hs = cs.svds_params_create()
    # set-time validation: bad codes/names report failure to the C caller
    assert cs.svds_params_set(hs, "target", "-1") == -1
    assert cs.svds_params_set(hs, "target", "3") == -1
    assert cs.svds_params_set(hs, "method", "normaleqations") == -1
    assert cs.svds_params_set_method(hs, "primme_svds_bogus", "", "") == -1
    assert cs.svds_params_set_method(hs, "primme_svds_hybrid", "",
                                     "PRIMME_JDQMR") == 0
    # method_stage2 round-trips as its primme_preset_method code
    assert cs.svds_params_get(hs, "methodStage2", out.ctypes.data) == 0
    from primme_tpu.params import Method
    assert out[0] == float(list(Method.__members__).index("JDQMR"))
    assert cs.svds_params_get(hs, "method", out.ctypes.data) == 0
    assert out[0] == 1.0                      # primme_svds_hybrid
    assert cs.svds_params_free(hs) == 0


def test_f77_target_codes_follow_primme_target_order():
    """Integer target codes must follow the reference primme_target enum
    (0 smallest, 1 largest, 2 closest_geq, 3 closest_leq, 4 closest_abs,
    5 largest_abs — include/primme_eigs.h:47-54), consistent with this
    package's own constant_info, so a value read back from
    params_get("target") feeds the F77 surface unchanged."""
    import numpy as np
    import scipy.sparse as sp
    from primme_tpu import capi_support as cs
    from primme_tpu.params import constant_info

    assert cs._which_str(constant_info("primme_smallest")) == "SA"
    assert cs._which_str(constant_info("primme_largest")) == "LA"
    assert cs._which_str(constant_info("primme_closest_geq")) == "CGT"
    assert cs._which_str(constant_info("primme_closest_leq")) == "CLT"
    assert cs._which_str(constant_info("primme_closest_abs")) == "SM"
    assert cs._which_str(constant_info("primme_largest_abs")) == "LM"

    # closest_abs (code 4) about sigma=2.0 end to end through the CSR
    # entry, and largest_abs (code 5) must NOT ignore sigma
    n = 60
    d = np.linspace(1.0, 6.0, n)
    A = sp.diags(d).tocsr().astype(np.float64)
    ip = A.indptr.astype(np.int64)
    ix = A.indices.astype(np.int64)
    dv = A.data.astype(np.float64)
    ev = np.zeros(2)
    X = np.zeros(2 * n)
    rn = np.zeros(2)
    rc = cs.eigsh_csr(n, len(dv), ip.ctypes.data, ix.ctypes.data,
                      dv.ctypes.data, 2, 4, 1e-9, "", 2.0,
                      ev.ctypes.data, X.ctypes.data, rn.ctypes.data)
    assert rc == 0, cs.last_error()
    close = d[np.argsort(np.abs(d - 2.0))][:2]
    assert np.abs(np.sort(ev) - np.sort(close)).max() < 1e-7
    rc = cs.eigsh_csr(n, len(dv), ip.ctypes.data, ix.ctypes.data,
                      dv.ctypes.data, 2, 5, 1e-9, "", 2.0,
                      ev.ctypes.data, X.ctypes.data, rn.ctypes.data)
    assert rc == 0, cs.last_error()
    far = d[np.argsort(-np.abs(d - 2.0))][:2]
    assert np.abs(np.sort(ev) - np.sort(far)).max() < 1e-7


@pytest.mark.skipif(shutil.which("gfortran") is None,
                    reason="gfortran not present")
def test_f90_program():
    """Compile and run the Fortran smoke test (native/test_f90.f90): a
    real Fortran program drives the underscore ABI — fixed-signature
    solve plus the label-based parameter surface (JDQMR preset +
    interior shift) — and checks pairs against the analytic spectrum."""
    import sysconfig
    if not os.path.exists(os.path.join(sysconfig.get_paths()["include"],
                                       "Python.h")):
        pytest.skip("CPython headers not present")
    r = subprocess.run(["make", "-C", NATIVE, "libprimme_tpu_capi.so",
                        "test_f90"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    purelib = sysconfig.get_paths()["purelib"]
    env = dict(os.environ,
               PYTHONPATH=os.pathsep.join(
                   [REPO, purelib, os.environ.get("PYTHONPATH", "")]),
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([os.path.join(NATIVE, "test_f90")], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "F90 OK" in r.stdout
