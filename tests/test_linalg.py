"""Unit tests for the masked dense numerics substrate (core/linalg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primme_tpu.core import linalg as la
from primme_tpu.params import Target
from primme_tpu.operators import DiagonalOperator


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.complex128])
def test_block_ortho_against_basis(dtype):
    n, mmax, bs, b = 50, 12, 3, 7
    key = jax.random.key(0)
    rdt = la.real_dtype(dtype)

    def rand(key, shape):
        if jnp.issubdtype(dtype, jnp.complexfloating):
            k1, k2 = jax.random.split(key)
            return (jax.random.normal(k1, shape, rdt)
                    + 1j * jax.random.normal(k2, shape, rdt)).astype(dtype)
        return jax.random.normal(key, shape, dtype)

    k1, k2, k3 = jax.random.split(key, 3)
    Vfull = jnp.linalg.qr(rand(k1, (n, b)))[0].astype(dtype)
    V = jnp.zeros((n, mmax), dtype).at[:, :b].set(Vfull)
    X = rand(k2, (n, bs))
    res = la.block_ortho(X, (V, V), None, jnp.int32(bs), k3)
    eps = la.machine_eps(dtype)
    # X^H X = I
    G = np.asarray(la.gram(res.X, res.X))
    np.testing.assert_allclose(G, np.eye(bs), atol=200 * eps)
    # V^H X = 0
    O = np.asarray(la.gram(V, res.X))
    assert np.abs(O).max() < 200 * eps
    assert int(res.n_random) == 0


def test_block_ortho_rank_deficient_replaced():
    n, mmax, bs, b = 40, 10, 3, 5
    key = jax.random.key(1)
    V = jnp.zeros((n, mmax))
    Vb = jnp.linalg.qr(jax.random.normal(key, (n, b)))[0]
    V = V.at[:, :b].set(Vb)
    # Block whose columns all live in span(V) -> fully dependent.
    X = Vb @ jax.random.normal(jax.random.key(2), (b, bs))
    res = la.block_ortho(X, (V, V), None, jnp.int32(bs), jax.random.key(3))
    assert int(res.n_random) == bs
    G = np.asarray(la.gram(res.X, res.X))
    np.testing.assert_allclose(G, np.eye(bs), atol=1e-10)
    O = np.asarray(la.gram(V, res.X))
    assert np.abs(O).max() < 1e-10


def test_block_ortho_b_inner_product():
    n, mmax, bs = 30, 8, 2
    d = jnp.linspace(0.5, 3.0, n)
    B = DiagonalOperator(d)
    V = jnp.zeros((n, mmax))
    X = jax.random.normal(jax.random.key(4), (n, bs))
    res = la.block_ortho(X, (V, V), None, jnp.int32(bs), jax.random.key(5),
                         Bop=B)
    G = np.asarray(la.gram(res.X, res.BX))
    np.testing.assert_allclose(G, np.eye(bs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.BX),
                               np.asarray(d[:, None] * res.X), atol=1e-12)


@pytest.mark.parametrize("target,expect", [
    (Target.smallest, [0, 1, 2]),
    (Target.largest, [5, 4, 3]),
])
def test_solve_h_rr_masked_sorting(target, expect):
    mmax, b = 9, 6
    evs = jnp.array([-3.0, -1.0, 0.5, 2.0, 4.0, 9.0])
    Q = jnp.linalg.qr(jax.random.normal(jax.random.key(6), (b, b)))[0]
    Hb = Q @ jnp.diag(evs) @ Q.T
    H = jnp.zeros((mmax, mmax)).at[:b, :b].set(Hb)
    sol = la.solve_H_rr(H, jnp.int32(b), target, jnp.zeros((1,)),
                        jnp.int32(0))
    got = np.asarray(sol.hvals[:3])
    np.testing.assert_allclose(got, np.asarray(evs)[expect], atol=1e-12)
    assert bool(sol.active[:b].all()) and not bool(sol.active[b:].any())
    # Padded coefficient columns are zero.
    assert np.abs(np.asarray(sol.hvecs[:, b:])).max() == 0.0


def test_solve_h_rr_interior_targets():
    mmax, b = 8, 8
    evs = jnp.arange(1.0, 9.0)  # 1..8
    H = jnp.diag(evs)
    shifts = jnp.array([4.2])
    sol = la.solve_H_rr(H, jnp.int32(b), Target.closest_abs, shifts,
                        jnp.int32(0))
    np.testing.assert_allclose(np.asarray(sol.hvals[:3]), [4.0, 5.0, 3.0])
    sol = la.solve_H_rr(H, jnp.int32(b), Target.closest_geq, shifts,
                        jnp.int32(0))
    np.testing.assert_allclose(np.asarray(sol.hvals[:3]), [5.0, 6.0, 7.0])
    sol = la.solve_H_rr(H, jnp.int32(b), Target.closest_leq, shifts,
                        jnp.int32(0))
    np.testing.assert_allclose(np.asarray(sol.hvals[:3]), [4.0, 3.0, 2.0])
    sol = la.solve_H_rr(H, jnp.int32(b), Target.largest_abs, shifts,
                        jnp.int32(0))
    np.testing.assert_allclose(np.asarray(sol.hvals[:2]), [8.0, 1.0])


def test_compute_residuals_fused():
    n, mmax, b, c = 25, 7, 5, 3
    key = jax.random.key(7)
    A = jax.random.normal(key, (n, n))
    A = (A + A.T) / 2
    V = jnp.zeros((n, mmax))
    Vb = jnp.linalg.qr(jax.random.normal(jax.random.key(8), (n, b)))[0]
    V = V.at[:, :b].set(Vb)
    W = A @ V
    H = la.gram(V, W)
    sol = la.solve_H_rr(H, jnp.int32(b), Target.smallest, jnp.zeros((1,)),
                        jnp.int32(0))
    cand = la.compute_residuals(V, W, None, sol.hvecs[:, :c], sol.hvals[:c])
    # Residual identity: R = A X - X diag(lambda) restricted to the basis.
    X = np.asarray(cand.X)
    R_direct = np.asarray(A) @ X - X * np.asarray(sol.hvals[:c])[None, :]
    # compute_residuals uses W h - X lam = (A V) h - X lam = A X - X lam.
    np.testing.assert_allclose(np.asarray(cand.R), R_direct, atol=1e-11)
    np.testing.assert_allclose(np.asarray(cand.resnorms),
                               np.linalg.norm(R_direct, axis=0), atol=1e-11)


# ---------------------------------------------------------------------------
# Bucketed locked-space projections (prefix_project / prefix_project2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("count", [0, 1, 15, 16, 17, 40, 64, 100])
def test_prefix_project_matches_full(count):
    """Bucketed projection == full-width projection when columns >= count
    are exactly zero (the state invariant of evecs/Bevecs)."""
    rng = np.random.default_rng(count)
    n, W, c = 200, 100, 3
    Q = np.zeros((n, W))
    Qr, _ = np.linalg.qr(rng.normal(size=(n, max(count, 1))))
    Q[:, :count] = Qr[:, :count]
    C = Q * rng.uniform(0.5, 1.5, size=(1, W))  # C need not equal Q
    C[:, count:] = 0.0
    X = rng.normal(size=(n, c))
    full = X - Q @ (C.T @ X)
    got = la.prefix_project(jnp.asarray(Q), jnp.asarray(C), jnp.asarray(X),
                            jnp.asarray(count, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), full, atol=1e-12)


@pytest.mark.parametrize("same", [True, False])
def test_prefix_project2_matches_full(same):
    rng = np.random.default_rng(7)
    n, W, c, count = 150, 48, 2, 9
    Q = np.zeros((n, W))
    Q[:, :count] = np.linalg.qr(rng.normal(size=(n, count)))[0]
    BQ = Q if same else Q * 1.7
    X = rng.normal(size=(n, c))
    BX = X if same else X * 1.7
    oq = BQ.T @ X
    Xf = X - Q @ oq
    BXf = Xf if same else BX - BQ @ oq
    X2, BX2 = la.prefix_project2(jnp.asarray(Q), jnp.asarray(BQ),
                                 jnp.asarray(X), jnp.asarray(BX),
                                 jnp.asarray(count, jnp.int32), same=same)
    np.testing.assert_allclose(np.asarray(X2), Xf, atol=1e-12)
    np.testing.assert_allclose(np.asarray(BX2), BXf, atol=1e-12)
