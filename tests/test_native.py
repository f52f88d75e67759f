"""Native C++ mmio/ELL path vs the scipy path."""

import numpy as np
import pytest
import scipy.sparse as sp

from primme_tpu import native
from primme_tpu.io import read_mtx
from primme_tpu.operators import ELLOperator

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.mark.parametrize("path", ["/root/reference/tests/LUNDA.mtx",
                                  "/root/reference/tests/mhd1280b.mtx",
                                  "/root/reference/tests/rect.mtx",
                                  "/root/reference/tests/lund_b.mtx"])
def test_parse_matches_scipy(path):
    res = native.read_mtx_coo(path)
    assert res is not None
    m, n, rows, cols, vals = res
    A_native = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    A_scipy = sp.csr_matrix(read_mtx(path))
    d = abs(A_native - A_scipy)
    assert (d.max() if d.nnz else 0.0) == 0.0


def test_ell_pack_matvec():
    path = "/root/reference/tests/mhd1280b.mtx"
    m, n, rows, cols, vals = native.read_mtx_coo(path)
    ec, ev = native.coo_to_ell(m, rows, cols, vals)
    ref = ELLOperator.from_scipy(sp.csr_matrix(read_mtx(path)))
    x = np.random.default_rng(0).normal(size=(n, 2)) + 0j
    y1 = np.asarray(ELLOperator(ec, ev, shape=(m, n)).matmat(x))
    y2 = np.asarray(ref.matmat(x))
    assert np.abs(y1 - y2).max() < 1e-12
