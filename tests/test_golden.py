"""Golden-file configs from the reference test suite (SURVEY §4.1):
run the reference's own tests/tests/test_??? configs through the harness
and verify against its stored solutions."""

import os

import pytest

from primme_tpu.testharness import run_config, run_svds_config

TESTS = "/root/reference/tests/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(TESTS),
                                reason="reference test configs not present")

# ALL of the reference's own golden configs run by default (~12 min on
# CPU, measured); nothing is gated behind an env var.
EIGS_ALL = ["test_001", "test_002", "test_003", "test_004", "test_005",
            "test_006", "test_007",
            "test_101", "test_102", "test_103", "test_104", "test_105",
            "test_106"]
SVDS_ALL = ["test_201", "test_202", "test_203", "test_204", "test_205",
            "test_206", "test_207"]


@pytest.mark.parametrize("name", EIGS_ALL)
def test_eigs_golden(name):
    r = run_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)


@pytest.mark.parametrize("name", SVDS_ALL)
def test_svds_golden(name):
    r = run_svds_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)
