"""Golden-file configs from the reference test suite (SURVEY §4.1):
run the reference's own tests/tests/test_??? configs through the harness
and verify against its stored solutions.

Like the reference's runner (``tests/Makefile:98-101``), every real
``test_0??`` config also runs in doublecomplex against the
``sol_???_doublecomplex`` goldens. Harness slack is eps_slack=5 /
mv_slack=2 (plus a separate allowance for the spectrum-verification
probe, a capability the reference lacks).
"""

import os

import pytest

from primme_tpu.testharness import run_config, run_svds_config

TESTS = "/root/reference/tests/tests"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(TESTS),
                                 reason="reference test configs not present")]

# ALL of the reference's own golden configs run by default; nothing is
# gated behind an env var. test_0?? run in both double and doublecomplex.
EIGS_REAL = ["test_001", "test_002", "test_003", "test_004", "test_005",
             "test_006", "test_007"]
EIGS_COMPLEX = ["test_101", "test_102", "test_103", "test_104", "test_105",
                "test_106"]
SVDS_ALL = ["test_201", "test_202", "test_203", "test_204", "test_205",
            "test_206", "test_207"]


@pytest.mark.parametrize("name", EIGS_REAL)
@pytest.mark.parametrize("dtype", ["double", "doublecomplex"])
def test_eigs_golden(name, dtype):
    r = run_config(os.path.join(TESTS, name),
                   dtype=(complex if dtype == "doublecomplex" else None))
    assert r.ok, repr(r)


@pytest.mark.parametrize("name", EIGS_COMPLEX)
def test_eigs_golden_complex(name):
    r = run_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)


@pytest.mark.parametrize("name", SVDS_ALL)
def test_svds_golden(name):
    r = run_svds_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)
