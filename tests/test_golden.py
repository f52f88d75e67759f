"""Golden-file configs from the reference test suite (SURVEY §4.1):
run the reference's own tests/tests/test_??? configs through the harness
and verify against its stored solutions."""

import os

import pytest

from primme_tpu.testharness import run_config, run_svds_config

TESTS = "/root/reference/tests/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(TESTS),
                                reason="reference test configs not present")


@pytest.mark.parametrize("name", ["test_001", "test_002", "test_003",
                                  "test_004", "test_005", "test_006",
                                  "test_007"])
def test_eigs_golden(name):
    r = run_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)


@pytest.mark.parametrize("name", ["test_101", "test_102", "test_103",
                                  "test_104", "test_105", "test_106"])
def test_eigs_golden_complex(name):
    r = run_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)


@pytest.mark.parametrize("name", ["test_201", "test_202", "test_203",
                                  "test_204", "test_205", "test_206",
                                  "test_207"])
def test_svds_golden(name):
    r = run_svds_config(os.path.join(TESTS, name))
    assert r.ok, repr(r)
