"""Matrix I/O: MatrixMarket loading into TPU-friendly operators.

Replaces the reference test harness's CSR MatrixMarket path
(``tests/COMMON/mmio.c`` + ``ssrcsr.c`` symmetric-to-full expansion): load
a ``.mtx`` file, expand symmetry, and pack into an
:class:`~primme_tpu.operators.ELLOperator` (or return the scipy matrix).

A native C++ fast path for the parse+pack (large files) lives in
``native/``; this module falls back to scipy when the extension is not
built.
"""

from __future__ import annotations

from typing import Union

import numpy as np


def read_mtx(path: str, dense: bool = False):
    """Read a MatrixMarket file into a scipy CSR matrix (symmetry
    expanded, like the reference's ``ssrcsr``)."""
    import scipy.io as sio
    import scipy.sparse as sp

    A = sio.mmread(path)
    if sp.issparse(A):
        A = A.tocsr()
        return A.toarray() if dense else A
    return np.asarray(A)


def load_operator(path: str):
    """Load a ``.mtx`` file as an :class:`ELLOperator` (square) — the
    jax-native analogue of the reference driver's matrix setup
    (``tests/driver.c`` native CSR path)."""
    from .operators import ELLOperator

    return ELLOperator.from_scipy(read_mtx(path))
