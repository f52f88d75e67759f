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
