"""Halo-exchange row-partitioned SpMM (primme_tpu.distributed).

The reference's parallel contract: each rank owns nLocal rows and the
matvec communicates only boundary data (include/primme_eigs.h:188-198;
tests/COMMON/petscw.c). These tests assert — via compiled-HLO
inspection — that the per-matvec collective volume is O(halo*k), not
O(n*k), plus numeric parity and the eigsh end-to-end path on the
virtual 8-device mesh.
"""

import re

import jax
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from primme_tpu import eigsh
from primme_tpu.distributed import HaloELLOperator


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("rows",))


def _band_matrix(n, halfband, per_row, seed=0):
    """Sparse symmetric matrix with scattered nnz inside |i-j|<=halfband:
    too many distinct offsets for the DIA path, small halo for the row
    partition."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), per_row)
    cols = rows + rng.integers(-halfband, halfband + 1, size=rows.size)
    keep = (cols >= 0) & (cols < n)
    A = sp.coo_matrix((rng.normal(size=keep.sum()),
                       (rows[keep], cols[keep])), shape=(n, n))
    A = (A + A.T + sp.diags(np.linspace(1, 50, n) + 2 * per_row)).tocsr()
    return A


def test_halo_matvec_matches_and_comm_is_o_halo(mesh8):
    n, k = 1024, 8
    A = _band_matrix(n, 3, 3)
    op, perm = HaloELLOperator.from_scipy(A, mesh8, try_rcm=False)
    assert perm is None
    assert op.halo <= 3 + 3  # reach bounded by the band
    rng = np.random.default_rng(1)
    X = rng.normal(size=(n, k))
    Xd = jax.device_put(X, NamedSharding(mesh8, P("rows", None)))
    with mesh8:
        f = jax.jit(op.matmat)
        Y = np.asarray(f(Xd))
        hlo = f.lower(Xd).compile().as_text()
    assert np.abs(Y - A @ X).max() < 1e-12 * abs(A).sum(axis=1).max()

    # communication contract: NO all-gather of the vector block; exactly
    # two neighbor collective-permutes of [halo, k] each
    assert "all-gather" not in hlo
    cp_shapes = re.findall(r"f\d+\[(\d+),(\d+)\][^\n]*collective-permute",
                           hlo)
    assert len(cp_shapes) == 2, hlo
    for rows_, cols_ in cp_shapes:
        assert int(rows_) == op.halo and int(cols_) == k


def test_halo_zero_when_block_diagonal(mesh8):
    n = 512
    blocks = [np.outer(v, v) + np.eye(64) for v in
              np.random.default_rng(2).normal(size=(8, 64))]
    A = sp.block_diag(blocks).tocsr()
    op, _ = HaloELLOperator.from_scipy(A, mesh8, try_rcm=False)
    assert op.halo == 0
    X = np.random.default_rng(3).normal(size=(n, 4))
    with mesh8:
        Y = np.asarray(jax.jit(op.matmat)(
            jax.device_put(X, NamedSharding(mesh8, P("rows", None)))))
        hlo = jax.jit(op.matmat).lower(
            jax.device_put(X, NamedSharding(mesh8, P("rows", None)))
        ).compile().as_text()
    assert np.abs(Y - A @ X).max() < 1e-10
    assert "collective-permute" not in hlo and "all-gather" not in hlo


def test_rcm_shrinks_halo(mesh8):
    # a matrix band-reducible only after RCM: permute a banded matrix
    n = 1024
    A0 = _band_matrix(n, 4, 3, seed=4)
    p = np.random.default_rng(5).permutation(n)
    A = A0[p][:, p]
    packed = HaloELLOperator.from_scipy(A, mesh8, try_rcm=True)
    assert packed is not None
    op, perm = packed
    assert perm is not None and op.halo <= 64
    X = np.random.default_rng(6).normal(size=(n, 4))
    with mesh8:
        Y = np.asarray(jax.jit(op.matmat)(
            jax.device_put(X[perm], NamedSharding(mesh8, P("rows", None)))))
    ref = (A @ X)[perm]
    assert np.abs(Y - ref).max() < 1e-10


def test_pack_rejections(mesh8):
    # n not a shard multiple
    A = sp.eye(1001, format="csr")
    assert HaloELLOperator.from_scipy(A, mesh8) is None
    # halo beyond one-shard reach even after RCM: dense anti-diagonal
    # couples row 0 to column n-1
    n = 256
    B = (sp.eye(n) + sp.coo_matrix(
        (np.ones(n), (np.arange(n), n - 1 - np.arange(n))),
        shape=(n, n))).tocsr()
    r = HaloELLOperator.from_scipy(B, mesh8)
    assert r is None or r[0].halo <= n // 8


def test_eigsh_mesh_uses_halo_and_matches(mesh8):
    """End-to-end: a sparse matrix that defeats the DIA/banded chooser
    (301 distinct offsets) but has a small halo solves under the mesh via
    the halo path and matches the dense ground truth."""
    n = 2048
    A = _band_matrix(n, 150, 2, seed=7)
    ref = np.linalg.eigvalsh(A.toarray())
    with mesh8:
        vals, vecs, st = eigsh(A, k=4, which="SA", tol=1e-9, mesh=mesh8,
                               return_stats=True,
                               raise_for_unconverged=False)
    assert np.abs(np.sort(vals) - ref[:4]).max() < 1e-6
    # the eigenvectors must be returned in the ORIGINAL ordering
    R = A @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * np.abs(ref).max()


def test_halo_overlap_structure(mesh8):
    """Communication/computation overlap (BASELINE ">=80% on v5p-16"
    prerequisite): in the compiled matvec, the interior rows' gather/FMA
    must have NO data dependency on the halo ppermutes — the scheduler
    can then run it between the async collective-permute start/done pair
    while boundary segments are in flight. Asserted structurally on the
    jaxpr: at least one dot_general whose transitive inputs exclude
    every ppermute, sized to the interior rows, plus tainted dot(s) for
    the boundary rows."""
    n, k = 1024, 8
    A = _band_matrix(n, 3, 3)
    op, _ = HaloELLOperator.from_scipy(A, mesh8, try_rcm=False)
    nl = n // 8
    assert op.halo > 0 and op.hrows is not None
    assert 0 < op.hrows <= op.halo  # band reach bounds the edge rows
    rng = np.random.default_rng(2)
    X = rng.normal(size=(n, k))
    Xd = jax.device_put(X, NamedSharding(mesh8, P("rows", None)))
    with mesh8:
        jaxpr = jax.make_jaxpr(op.matmat)(Xd)

    # locate the (nested) jaxpr that holds the ppermute eqns
    def find_ppermute_jaxpr(j):
        if any(e.primitive.name == "ppermute" for e in j.eqns):
            return j
        for e in j.eqns:
            for v in e.params.values():
                inner = getattr(v, "jaxpr", v)
                if hasattr(inner, "eqns"):
                    r = find_ppermute_jaxpr(inner)
                    if r is not None:
                        return r
        return None

    body = find_ppermute_jaxpr(jaxpr.jaxpr)
    assert body is not None, "no ppermute in the compiled matvec"

    tainted = set()
    clean_dots, tainted_dots = [], []
    for e in body.eqns:
        deps = any(getattr(v, "count", None) is not None and v in tainted
                   for v in e.invars)
        is_pp = e.primitive.name == "ppermute"
        if is_pp or deps:
            tainted.update(e.outvars)
        if e.primitive.name == "dot_general":
            (tainted_dots if (is_pp or deps) else clean_dots).append(e)

    # the interior FMA is ppermute-independent and covers the interior rows
    interior_rows = nl - 2 * op.hrows
    assert any(e.outvars[0].aval.shape[0] == interior_rows
               for e in clean_dots), (
        f"no ppermute-independent dot over the {interior_rows} interior "
        f"rows: clean={[(e.outvars[0].aval.shape) for e in clean_dots]}")
    # and the boundary rows do consume the exchanged halos
    assert tainted_dots, "boundary FMA lost its halo dependency"
