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
