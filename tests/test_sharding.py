"""Multi-device (virtual 8-CPU mesh) SPMD tests.

Stands in for a TPU pod slice per SURVEY §4: the same row-partitioned
solve as the reference under mpirun -np 4 (tests/Makefile:97-99), with
psum reductions replacing globalSum."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import Mesh

from primme_tpu import eigsh, svds, Stencil3DOperator, Method


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("rows",))


def test_eigsh_sharded_matches_single(mesh8):
    n = 400
    d = np.linspace(1, 80, n)
    A = sp.diags([d, 0.2 * np.ones(n - 1), 0.2 * np.ones(n - 1)],
                 [0, 1, -1]).tocsr()
    ref = np.linalg.eigvalsh(A.toarray())
    with mesh8:
        vals, vecs = eigsh(A, k=4, which="SA", tol=1e-9, mesh=mesh8,
                           raise_for_unconverged=False)
    assert np.abs(np.sort(vals) - ref[:4]).max() < 1e-7


def test_stencil_sharded(mesh8):
    A = Stencil3DOperator(16, 8, 8, dtype=np.float32)
    with mesh8:
        vals, vecs = eigsh(A, k=3, which="SA", tol=1e-4, mesh=mesh8,
                           jacobi=True, raise_for_unconverged=False)
    ax = lambda N: 2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1))
    lam = (ax(16)[:4, None, None] + ax(8)[None, :4, None]
           + ax(8)[None, None, :4]).ravel()
    assert np.abs(np.sort(vals) - np.sort(lam)[:3]).max() < 1e-2


def test_svds_stage1_sharded(mesh8):
    rng = np.random.default_rng(5)
    A = rng.normal(size=(256, 160)).astype(np.float64)
    sref = np.linalg.svd(A, compute_uv=False)
    with mesh8:
        U, s, Vt = svds(A, k=3, which="LM", tol=1e-9, mesh=mesh8)
    assert np.abs(np.sort(s) - np.sort(sref)[-3:]).max() < 1e-7 * sref[0]


def test_svds_two_stage_hybrid_sharded(mesh8):
    """Both stages run under the SAME distribution (the reference's
    contract, primme_svds_c.c:219): a hybrid SM solve whose augmented
    stage-2 must thread the mesh, with m and n NOT shard multiples so
    the [v; u] halves are pad-aligned. Matches the single-device run."""
    rng = np.random.default_rng(6)
    m, n, k = 250, 158, 3          # 250 % 8 != 0, 158 % 8 != 0
    A = rng.normal(size=(m, n))
    sref = np.sort(np.linalg.svd(A, compute_uv=False))
    U1, s1, Vt1 = svds(A, k=k, which="SM", tol=1e-9)
    with mesh8:
        U, s, Vt = svds(A, k=k, which="SM", tol=1e-9, mesh=mesh8)
    assert np.abs(np.sort(s) - sref[:k]).max() < 1e-7 * sref[-1]
    assert np.abs(np.sort(s) - np.sort(s1)).max() < 1e-7 * sref[-1]
    # triplet residuals in the ORIGINAL (unpadded) coordinates
    R1 = A @ Vt.conj().T - U * s[None, :]
    R2 = A.T @ U - Vt.conj().T * s[None, :]
    rn = np.sqrt((R1 ** 2).sum(0) + (R2 ** 2).sum(0))
    assert rn.max() < 1e-7 * sref[-1]
