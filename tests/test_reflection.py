"""Label reflection surfaces: eigs constant_info + svds params
(``primme_constant_info``, ``src/eigs/primme_interface.c:1100+``;
``primme_svds_set/get_member``, ``src/svds/primme_svds_interface.c:406+``).
"""

import numpy as np
import pytest

from primme_tpu.params import (PrimmeParams, set_member, get_member,
                               member_info, constant_info, constant_names,
                               Target, Projection)
from primme_tpu.svds import (SvdsParams, svds_set_member, svds_get_member,
                             svds_member_info, svds_display_params,
                             svds_from_params)


def test_constant_info_reference_values():
    # spot-check against the reference headers' declaration order
    # (include/primme_eigs.h:47-101,256-273; include/primme_svds.h:59-76)
    assert constant_info("primme_smallest") == 0
    assert constant_info("primme_largest_abs") == 5
    assert constant_info("primme_proj_refined") == 3
    assert constant_info("primme_init_user") == 3
    assert constant_info("primme_adaptive") == 3
    assert constant_info("primme_event_profile") == 7
    assert constant_info("primme_orth_explicit_I") == 2
    assert constant_info("PRIMME_DYNAMIC") == 1
    assert constant_info("PRIMME_JDQMR_ETol") == 12
    assert constant_info("PRIMME_LOBPCG_OrthoBasis_Window") == 15
    assert constant_info("primme_svds_smallest") == 1
    assert constant_info("primme_svds_op_augmented") == 3
    with pytest.raises(KeyError):
        constant_info("primme_no_such_constant")
    assert "primme_proj_RR" in constant_names("primme_proj_")


def test_eigs_member_roundtrip_dotted_labels():
    p = PrimmeParams(n=100, num_evals=3)
    p = set_member(p, "correction.maxInnerIterations", "-1")
    assert p.max_inner_iterations == -1
    p = set_member(p, "maxBasisSize", "24")
    assert get_member(p, "maxBasisSize") == 24
    p = set_member(p, "projection.projection", "primme_proj_harmonic")
    assert p.projection == Projection.harmonic
    p = set_member(p, "targetShifts", "0.5, 1.5")
    assert p.target_shifts == (0.5, 1.5)
    p = set_member(p, "target", "primme_closest_abs")
    assert p.target == Target.closest_abs


def test_svds_member_roundtrip():
    sp = SvdsParams()
    for name, val, expect in [
        ("numSvals", "4", 4),
        ("eps", "1e-10", 1e-10),
        ("aNorm", 2.5, 2.5),
        ("maxMatvecs", "10000", 10000),
        ("target", "primme_svds_smallest", "primme_svds_smallest"),
        ("method", "primme_svds_hybrid", "hybrid"),
        ("primme.maxBasisSize", "35", 35),
        ("primme.correction.maxInnerIterations", "-1", -1),
        ("primmeStage2.maxBlockSize", 2, 2),
    ]:
        sp = svds_set_member(sp, name, val)
        assert svds_get_member(sp, name) == expect, name
    # integer target code (F77 surface)
    sp = svds_set_member(sp, "target", 0)
    assert sp.target == "primme_svds_largest"
    with pytest.raises(KeyError):
        svds_set_member(sp, "noSuchField", 1)
    with pytest.raises(KeyError):
        svds_set_member(sp, "primme.noSuchField", 1)
    info = svds_member_info("primmeStage2.eps")
    assert info["name"] == "eps"
    dump = svds_display_params(sp)
    assert "primme_svds.num_svals = 4" in dump
    assert "primme_svds.primme.max_basis_size = 35" in dump


def test_svds_set_member_validates_enums_at_set_time():
    """The C ABI reports success/failure per call: bad target codes and
    method names must raise HERE, not at run time (and a negative code
    must not Python-index into a valid target)."""
    sp = SvdsParams()
    for bad in (-1, "-1", 3, "3", 17):
        with pytest.raises(ValueError):
            svds_set_member(sp, "target", bad)
    with pytest.raises(ValueError):
        svds_set_member(sp, "method", "normaleqations")   # typo
    with pytest.raises(ValueError):
        svds_set_member(sp, "method", "primme_svds_bogus")
    with pytest.raises(ValueError):
        svds_set_member(sp, "methodStage2", "NOT_A_METHOD")
    sp = svds_set_member(sp, "methodStage2", "PRIMME_JDQMR")
    assert sp.method_stage2 == "JDQMR"
    sp = svds_set_member(sp, "method", "augmented")
    assert sp.method == "augmented"


def test_svds_from_params_end_to_end():
    """The reference's dprimme_svds flow: configuration struct in,
    triplets out — embedded stage overrides must reach the solves."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(60, 40))
    sref = np.sort(np.linalg.svd(A, compute_uv=False))[::-1]
    sp = SvdsParams()
    sp = svds_set_member(sp, "numSvals", 3)
    sp = svds_set_member(sp, "eps", 1e-9)
    sp = svds_set_member(sp, "target", "primme_svds_largest")
    sp = svds_set_member(sp, "primme.maxBasisSize", 20)
    U, s, Vt = svds_from_params(A, sp)
    assert np.abs(np.sort(s)[::-1] - sref[:3]).max() < 1e-7 * sref[0]
