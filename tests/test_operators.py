"""Operator-selection layer: dense fallback, DIA+ELL hybrid split."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from primme_tpu import eigsh
from primme_tpu.operators import (aslinearoperator, dia_ell_hybrid,
                                  rcm_banded, DenseOperator, SumOperator,
                                  BandedOperator, ELLOperator)


def _tridiag_plus_scatter(n=2500, density=1e-4, seed=1):
    T = sp.diags([np.full(n - 1, -1.), np.arange(1., n + 1),
                  np.full(n - 1, -1.)], [-1, 0, 1])
    S = sp.random(n, n, density=density, random_state=seed)
    return (T + S + S.T).tocsr()


def test_dense_fallback_small_sparse():
    """Below ~8k rows a sparse matrix densifies: the MXU streams n*m at
    HBM peak while TPU gathers run ~1 Gnnz/s (measured) — dense wins at
    any realistic sparsity."""
    A = sp.random(500, 500, density=0.01, random_state=0)
    op = aslinearoperator(A.tocsr())
    assert isinstance(op, DenseOperator)
    X = np.random.default_rng(0).normal(size=(500, 3))
    assert np.abs(np.asarray(op.matmat(jnp.asarray(X))) - A @ X).max() < 1e-10


def test_dia_ell_hybrid_split():
    """Dominantly-banded matrices with scattered extras split into a
    shift-speed DIA part plus a small gather remainder."""
    A = _tridiag_plus_scatter()
    H = dia_ell_hybrid(A)
    assert isinstance(H, SumOperator)
    kinds = {type(o) for o in H.ops}
    assert kinds == {BandedOperator, ELLOperator}
    rng = np.random.default_rng(0)
    X = rng.normal(size=(A.shape[0], 4))
    Xj = jnp.asarray(X)
    assert np.abs(np.asarray(H.matmat(Xj)) - A @ X).max() < 1e-9
    assert np.abs(np.asarray(H.rmatmat(Xj)) - A.T @ X).max() < 1e-9
    assert np.abs(np.asarray(H.diagonal()) - A.diagonal()).max() == 0.0
    # rcm_banded falls through to the hybrid for this matrix
    rb = rcm_banded(A)
    assert rb is not None and isinstance(rb[0], SumOperator)


def test_eigsh_through_hybrid():
    A = _tridiag_plus_scatter()
    vals, _ = eigsh(A, k=3, which="SA", tol=1e-8, maxMatvecs=4000,
                    raise_for_unconverged=False)
    tru = sp.linalg.eigsh(A, k=3, which="SA", return_eigenvectors=False)
    assert np.abs(np.sort(vals) - np.sort(tru)).max() < 1e-6


def _fem_like(n=1600, b=8, seed=3):
    """Block-clustered sparsity: dense 8x8 tiles scattered off the
    diagonal — the FEM/graph pattern DIA cannot cover."""
    rng = np.random.default_rng(seed)
    nb = n // b
    rows, cols, vals = [], [], []
    for i in range(nb):
        for j in {i, (i * 7 + 3) % nb, (i * 13 + 11) % nb}:
            blk = rng.normal(size=(b, b))
            r, c = np.meshgrid(np.arange(b), np.arange(b), indexing="ij")
            rows.append(i * b + r.ravel())
            cols.append(j * b + c.ravel())
            vals.append(blk.ravel())
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    return (A + A.T).tocsr()


def test_block_ell_correctness():
    from primme_tpu.operators import BlockELLOperator

    A = _fem_like()
    op = BlockELLOperator.from_scipy(A, block_size=8, with_transpose=True)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(A.shape[0], 5))
    Xj = jnp.asarray(X)
    assert np.abs(np.asarray(op.matmat(Xj)) - A @ X).max() < 1e-9
    assert np.abs(np.asarray(op.rmatmat(Xj)) - A.T @ X).max() < 1e-9
    assert np.abs(np.asarray(op.diagonal()) - A.diagonal()).max() < 1e-12


def test_block_ell_unaligned_and_rect():
    from primme_tpu.operators import BlockELLOperator

    rng = np.random.default_rng(1)
    A = sp.random(205, 117, density=0.05, random_state=2).tocsr()
    op = BlockELLOperator.from_scipy(A, block_size=8)
    X = rng.normal(size=(117, 3))
    Y = rng.normal(size=(205, 3))
    assert np.abs(np.asarray(op.matmat(jnp.asarray(X))) - A @ X).max() < 1e-9
    assert np.abs(np.asarray(op.rmatmat(jnp.asarray(Y))) - A.T @ Y).max() < 1e-9


def test_rcm_falls_through_to_block_ell():
    from primme_tpu.operators import BlockELLOperator

    A = _fem_like(n=4000)
    rb = rcm_banded(A, max_diags=8, fill_factor=1.0)  # force DIA rejection
    assert rb is not None
    op, perm = rb
    assert isinstance(op, BlockELLOperator)
    X = np.random.default_rng(0).normal(size=(A.shape[0], 2))
    Ap = A[perm][:, perm] if perm is not None else A
    assert np.abs(np.asarray(op.matmat(jnp.asarray(X))) - Ap @ X).max() < 1e-9


def test_eigsh_through_block_ell():
    A = _fem_like(n=1600)
    A = A + sp.eye(A.shape[0]) * 50.0  # shift positive-ish for stability
    vals, _ = eigsh(A, k=3, which="LA", tol=1e-8, maxMatvecs=6000,
                    raise_for_unconverged=False)
    tru = sp.linalg.eigsh(A, k=3, which="LA", return_eigenvectors=False)
    assert np.abs(np.sort(vals) - np.sort(tru)).max() < 1e-6
