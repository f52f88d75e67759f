"""Operator layer: block-matvec linear operators and preconditioners.

The reference inverts control — the user supplies ``matrixMatvec``,
``applyPreconditioner`` and ``massMatrixMatvec`` C callbacks inside
``primme_params`` (``include/primme_eigs.h:166-253``) and the library calls
back for every application. Here the same inversion is functional: an
operator is anything implementing the :class:`LinearOperator` protocol —
a pytree-of-arrays plus a pure ``matmat(X)`` on an ``[n, k]`` block —
traceable under ``jit`` so the whole solve compiles to one XLA program.

Everything is **block-first** (SpMM, not SpMV): TPUs want multi-vector
operands feeding the MXU, matching the reference's ``maxBlockSize`` blocking
(``src/eigs/main_iter.c:527-575``).

Concrete operators:

* :class:`DenseOperator` — explicit matrix, one big MXU matmul.
* :class:`ELLOperator` — padded-row sparse (gather + fused multiply-add);
  the general-sparse workhorse, TPU-native replacement of the test
  harness's CSR + Sparskit ``amux`` (``tests/COMMON/matvec.f``).
* :class:`Stencil3DOperator` — 7-point 3D Laplacian applied by shifted
  slices; speed-of-light (no indices at all) for the grid benchmarks.
* :class:`DiagonalOperator` — diagonal matrices / Jacobi preconditioner.
* :class:`ShiftedPrecond` — wraps a diagonal into the shift-aware
  approximate inverse (A - sigma B)^{-1} the correction equation wants
  (the reference feeds shifts via ``ShiftsForPreconditioner``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _as_block(x):
    """Promote a vector to a 1-column block; return (block, was_vector)."""
    if x.ndim == 1:
        return x[:, None], True
    return x, False


@jax.tree_util.register_pytree_node_class
class LinearOperator:
    """Base class: square (or rectangular) operator with block apply.

    Subclasses store their arrays as pytree leaves so operators can be
    closed over or passed through ``jit`` boundaries and sharded.
    """

    shape: Tuple[int, int]
    dtype: Any

    # -- pytree plumbing (subclasses override _leaves/_aux) -------------
    def tree_flatten(self):
        return self._leaves(), self._aux()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj._init_from(leaves, aux)
        return obj

    def _leaves(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _aux(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _init_from(self, leaves, aux):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- user surface ----------------------------------------------------
    def matmat(self, X: jax.Array) -> jax.Array:  # pragma: no cover
        raise NotImplementedError

    def rmatmat(self, X: jax.Array) -> jax.Array:
        """Adjoint block apply (A^H X). Default: square Hermitian."""
        if self.shape[0] != self.shape[1]:
            raise NotImplementedError
        return self.matmat(X)

    def __call__(self, x: jax.Array) -> jax.Array:
        xb, was_vec = _as_block(x)
        y = self.matmat(xb)
        return y[:, 0] if was_vec else y

    def diagonal(self) -> Optional[jax.Array]:
        """Main diagonal if cheaply available (for Jacobi precond)."""
        return None

    def to_dense(self) -> jax.Array:
        n = self.shape[1]
        return self.matmat(jnp.eye(n, dtype=self.dtype))


@jax.tree_util.register_pytree_node_class
class DenseOperator(LinearOperator):
    """Explicit (dense) matrix operator; one MXU matmul per apply."""

    def __init__(self, A):
        self.A = jnp.asarray(A)
        self.shape = tuple(self.A.shape)
        self.dtype = self.A.dtype

    def _leaves(self):
        return (self.A,)

    def _aux(self):
        return None

    def _init_from(self, leaves, aux):
        (self.A,) = leaves
        self.shape = tuple(self.A.shape)
        self.dtype = self.A.dtype

    def matmat(self, X):
        return self.A @ X

    def rmatmat(self, X):
        return self.A.conj().T @ X

    def diagonal(self):
        return jnp.diagonal(self.A)

    def to_dense(self):
        return self.A


@jax.tree_util.register_pytree_node_class
class DiagonalOperator(LinearOperator):
    """Diagonal matrix; elementwise block scale (VPU)."""

    def __init__(self, d):
        self.d = jnp.asarray(d)
        n = self.d.shape[0]
        self.shape = (n, n)
        self.dtype = self.d.dtype

    def _leaves(self):
        return (self.d,)

    def _aux(self):
        return None

    def _init_from(self, leaves, aux):
        (self.d,) = leaves
        self.shape = (self.d.shape[0],) * 2
        self.dtype = self.d.dtype

    def matmat(self, X):
        return self.d[:, None] * X

    def rmatmat(self, X):
        return self.d.conj()[:, None] * X

    def diagonal(self):
        return self.d


@jax.tree_util.register_pytree_node_class
class ELLOperator(LinearOperator):
    """ELLPACK sparse operator: per-row padded column indices + values.

    ``cols``: int32 ``[n, w]``, ``vals``: ``[n, w]`` where ``w`` is the max
    nnz per row; padding entries have ``vals == 0`` and ``cols`` pointing at
    row 0 (harmless gather). Apply is ``sum_k vals[:, k] * X[cols[:, k], :]``
    — a gather plus fused multiply-adds, all static shapes, which XLA maps
    well onto the VPU. Replaces the reference test harness's CSR matvec
    (``tests/COMMON/matvec.f`` ``amux``) with a layout TPUs can stream.
    """

    def __init__(self, cols, vals, shape=None, colsT=None, valsT=None):
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self.vals = jnp.asarray(vals)
        n = self.cols.shape[0]
        self.shape = tuple(shape) if shape is not None else (n, n)
        self.dtype = self.vals.dtype
        # Optional transposed layout for rmatmat (rectangular operators).
        self.colsT = (jnp.asarray(colsT, jnp.int32)
                      if colsT is not None else None)
        self.valsT = jnp.asarray(valsT) if valsT is not None else None

    def _leaves(self):
        return (self.cols, self.vals, self.colsT, self.valsT)

    def _aux(self):
        return self.shape

    def _init_from(self, leaves, aux):
        self.cols, self.vals, self.colsT, self.valsT = leaves
        self.shape = aux
        self.dtype = self.vals.dtype

    def matmat(self, X):
        # [n, w, k] gather then weighted reduction over w.
        gathered = X[self.cols, :]                     # [n, w, k]
        return jnp.einsum("nw,nwk->nk", self.vals, gathered)

    def rmatmat(self, X):
        if self.colsT is None:
            return super().rmatmat(X)
        gathered = X[self.colsT, :]
        return jnp.einsum("nw,nwk->nk", self.valsT.conj(), gathered)

    def diagonal(self):
        isdiag = self.cols == jnp.arange(self.shape[0], dtype=jnp.int32)[:, None]
        return jnp.sum(jnp.where(isdiag, self.vals, 0), axis=1)

    @staticmethod
    def _pack(A):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n = A.shape[0]
        row_nnz = np.diff(A.indptr)
        w = max(int(row_nnz.max()), 1)
        cols = np.zeros((n, w), dtype=np.int32)
        vals = np.zeros((n, w), dtype=A.dtype)
        # vectorized scatter: nnz j of row i lands at (i, j - indptr[i])
        rows = np.repeat(np.arange(n), row_nnz)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], row_nnz)
        cols[rows, offs] = A.indices
        vals[rows, offs] = A.data
        return cols, vals

    @staticmethod
    def from_scipy(A) -> "ELLOperator":
        """Build from any scipy sparse matrix (host-side). Rectangular
        matrices also pack the transposed layout so ``rmatmat`` works."""
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        cols, vals = ELLOperator._pack(A)
        colsT, valsT = ELLOperator._pack(A.T.tocsr())
        return ELLOperator(cols, vals, shape=A.shape, colsT=colsT,
                           valsT=valsT)

    @staticmethod
    def from_coo(rows, cols, vals, shape) -> "ELLOperator":
        import scipy.sparse as sp

        A = sp.coo_matrix((vals, (rows, cols)), shape=shape)
        return ELLOperator.from_scipy(A)


@jax.tree_util.register_pytree_node_class
class BlockELLOperator(LinearOperator):
    """Block-ELLPACK (BSR-style) sparse operator: ``b x b`` dense blocks,
    ``w`` blocks per block-row.

    The TPU answer to scattered sparsity that DIA can't cover: instead of
    one scalar gather per nnz (ELLOperator, ~2 orders under HBM peak),
    gather whole ``b``-row panels of X (``b*k`` contiguous elements per
    index — ``b×`` fewer indices at ``b×`` the transfer granularity) and
    apply the stored blocks as a batched ``[w,b,b] @ [w,b,k]`` contraction
    that XLA maps onto the MXU. Replaces the reference harness's CSR
    ``amux`` (``tests/COMMON/matvec.f``) for locally-clustered matrices
    (FEM/graph problems after RCM).

    ``bcols``: int32 ``[nb, w]`` block-column indices (padding points at
    block 0 with zero blocks); ``bvals``: ``[nb, w, b, b]``.
    """

    def __init__(self, bcols, bvals, shape, bcolsT=None, bvalsT=None):
        self.bcols = jnp.asarray(bcols, jnp.int32)
        self.bvals = jnp.asarray(bvals)
        self.shape = tuple(shape)
        self.dtype = self.bvals.dtype
        self.bcolsT = (jnp.asarray(bcolsT, jnp.int32)
                       if bcolsT is not None else None)
        self.bvalsT = jnp.asarray(bvalsT) if bvalsT is not None else None

    def _leaves(self):
        return (self.bcols, self.bvals, self.bcolsT, self.bvalsT)

    def _aux(self):
        return self.shape

    def _init_from(self, leaves, aux):
        self.bcols, self.bvals, self.bcolsT, self.bvalsT = leaves
        self.shape = aux
        self.dtype = self.bvals.dtype

    @staticmethod
    def _apply(bcols, bvals, X, nrows):
        nb, w, b, _ = bvals.shape
        k = X.shape[1]
        ncb = -(-X.shape[0] // b)   # column blocks of the packed matrix
        npad = ncb * b - X.shape[0]
        Xb = (jnp.pad(X, ((0, npad), (0, 0))) if npad else X).reshape(
            ncb, b, k)
        G = Xb[bcols]                                   # [nb, w, b, k]
        Y = jnp.einsum("iwab,iwbk->iak", bvals, G)      # batched MXU blocks
        return Y.reshape(nb * b, k)[:nrows]

    def matmat(self, X):
        return self._apply(self.bcols, self.bvals, X, self.shape[0])

    def rmatmat(self, X):
        if self.bcolsT is None:
            return super().rmatmat(X)
        return self._apply(self.bcolsT, self.bvalsT.conj(), X, self.shape[1])

    def diagonal(self):
        nb, w, b, _ = self.bvals.shape
        own = self.bcols == jnp.arange(nb, dtype=jnp.int32)[:, None]
        dblk = jnp.diagonal(self.bvals, axis1=2, axis2=3)   # [nb, w, b]
        d = jnp.sum(jnp.where(own[:, :, None], dblk, 0), axis=1)
        return d.reshape(nb * b)[:self.shape[0]]

    @staticmethod
    def _pack(A, b):
        import scipy.sparse as sp

        m, n = A.shape
        nbr, nbc = -(-m // b), -(-n // b)
        A = sp.csr_matrix(A).copy()
        A.resize(nbr * b, nbc * b)  # zero-pad to block multiples
        Absr = sp.bsr_matrix(A, blocksize=(b, b))
        Absr.sort_indices()
        rows_nnz = np.diff(Absr.indptr)
        w = max(int(rows_nnz.max()), 1)
        bcols = np.zeros((nbr, w), dtype=np.int32)
        bvals = np.zeros((nbr, w, b, b), dtype=Absr.dtype)
        rows = np.repeat(np.arange(nbr), rows_nnz)
        offs = np.arange(len(Absr.indices)) - np.repeat(
            Absr.indptr[:-1], rows_nnz)
        bcols[rows, offs] = Absr.indices
        bvals[rows, offs] = Absr.data
        return bcols, bvals

    @staticmethod
    def from_scipy(A, block_size: int = 8,
                   with_transpose: bool = False) -> "BlockELLOperator":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        bcols, bvals = BlockELLOperator._pack(A, block_size)
        bcolsT = bvalsT = None
        if with_transpose or A.shape[0] != A.shape[1]:
            bcolsT, bvalsT = BlockELLOperator._pack(
                A.T.tocsr(), block_size)
        return BlockELLOperator(bcols, bvals, A.shape, bcolsT, bvalsT)


@jax.tree_util.register_pytree_node_class
class Stencil3DOperator(LinearOperator):
    """7-point 3D Laplacian stencil on an ``nx*ny*nz`` grid (Dirichlet).

    Matvec by shifted slices of the 3-D view — zero index traffic, pure
    VPU adds, and under row-sharding XLA lowers the axis-0 shifts to
    neighbor ``ppermute`` halo exchanges over ICI. This is the TPU-native
    answer to the benchmark configs' "128^3 Laplacian" (BASELINE.md).
    """

    def __init__(self, nx, ny, nz, dtype=jnp.float32, scale=1.0):
        self.nx, self.ny, self.nz = nx, ny, nz
        self._scale = scale
        n = nx * ny * nz
        self.shape = (n, n)
        self.dtype = jnp.dtype(dtype)

    def _leaves(self):
        return ()

    def _aux(self):
        return (self.nx, self.ny, self.nz, str(self.dtype), self._scale)

    def _init_from(self, leaves, aux):
        self.nx, self.ny, self.nz, dt, self._scale = aux
        n = self.nx * self.ny * self.nz
        self.shape = (n, n)
        self.dtype = jnp.dtype(dt)

    def matmat(self, X):
        k = X.shape[1]
        g = X.reshape(self.nx, self.ny, self.nz, k).astype(self.dtype)
        # pad+slice shifts: XLA fuses these into a single elementwise
        # kernel on TPU, unlike concatenate (which materializes operands)
        z3 = ((0, 0), (0, 0), (0, 0))

        def sh(axis, up):
            pw = list(z3[:axis]) + ([(0, 1)] if up else [(1, 0)]) \
                + list(z3[axis:2]) + [(0, 0)]
            gp = jnp.pad(g, pw)
            sl = [slice(None)] * 4
            sl[axis] = slice(1, None) if up else slice(0, -1)
            return gp[tuple(sl)]

        out = 6.0 * g
        for ax in range(3):
            out = out - sh(ax, True) - sh(ax, False)
        return (self._scale * out).reshape(-1, k)

    def diagonal(self):
        n = self.shape[0]
        return jnp.full((n,), 6.0 * self._scale, dtype=self.dtype)


class FunctionOperator(LinearOperator):
    """Wrap a pure function ``f: [n,k] -> [m,k]`` as an operator.

    Not a registered pytree (the function is static); close over arrays
    inside ``f`` if needed.
    """

    def __init__(self, f: Callable, shape, dtype, rf: Optional[Callable] = None,
                 diag: Optional[jax.Array] = None):
        self._f = f
        self._rf = rf
        self._diag = diag
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)

    def tree_flatten(self):
        return (), (self._f, self._rf, self._diag, self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        f, rf, diag, shape, dtype = aux
        return cls(f, shape, dtype, rf=rf, diag=diag)

    def matmat(self, X):
        return self._f(X)

    def rmatmat(self, X):
        if self._rf is not None:
            return self._rf(X)
        return super().rmatmat(X)

    def diagonal(self):
        return self._diag


jax.tree_util.register_pytree_node_class(FunctionOperator)


# ---------------------------------------------------------------------------
# Preconditioners
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class JacobiPrecond(LinearOperator):
    """Shift-aware Jacobi preconditioner: X -> X / (diag(A) - sigma).

    The correction equation wants an approximate inverse of (A - sigma B);
    the reference passes per-block shifts through
    ``ShiftsForPreconditioner`` (``include/primme_eigs.h``). Here
    :meth:`matmat_shifted` takes the shifts as a traced ``[k]`` vector.
    """

    def __init__(self, diag, eps: float = 1e-10, use_shifts: bool = True):
        self.d = jnp.asarray(diag)
        self.eps = eps
        self.use_shifts = use_shifts   # False: fixed K, ignore per-pair shifts
        n = self.d.shape[0]
        self.shape = (n, n)
        self.dtype = self.d.dtype

    def _leaves(self):
        return (self.d,)

    def _aux(self):
        return (self.eps, self.use_shifts)

    def _init_from(self, leaves, aux):
        (self.d,) = leaves
        self.eps, self.use_shifts = aux if isinstance(aux, tuple) else (aux, True)
        self.shape = (self.d.shape[0],) * 2
        self.dtype = self.d.dtype

    def _safe_inv(self, denom):
        mag = jnp.abs(denom)
        denom = jnp.where(mag < self.eps, self.eps, denom)
        return 1.0 / denom

    def matmat(self, X):
        return self._safe_inv(self.d)[:, None] * X

    def matmat_shifted(self, X, shifts):
        """Apply with per-column shifts: X[:, j] / (d - shifts[j])."""
        if not self.use_shifts:
            return self.matmat(X)
        denom = self.d[:, None] - shifts[None, :]
        mag = jnp.abs(denom)
        denom = jnp.where(mag < self.eps, self.eps, denom)
        return X / denom


@jax.tree_util.register_pytree_node_class
class ChebyshevPrecond(LinearOperator):
    """Polynomial (Chebyshev-iteration) preconditioner:
    ``z ~= (A - sigma I)^{-1} r`` with the error polynomial equioscillating
    on ``[a, b]``, the interval enclosing the *unwanted* spectrum of
    ``A - sigma I``.

    This is the TPU-native stand-in for the ILUT general preconditioner
    the reference's hard test configs use (``tests/COMMON/ilut.f`` —
    capability bar, not the algorithm): an incomplete-LU apply is two
    sequential triangular solves (hostile to the MXU and to SPMD row
    sharding), while Chebyshev iteration is ``degree`` extra block
    matvecs — exactly the op the hardware is fastest at, and it shards
    with the operator for free. Requires ``0 < a < b``: intended for
    extreme targets whose wanted eigenvalues lie *below* ``a``
    (SPD-style; shift ``sigma`` so this holds).

    Classic three-term recurrence (Saad, *Iterative Methods for Sparse
    Linear Systems*, alg. 12.1); one application costs ``degree``
    matvecs with A, amortized across the whole block on the MXU.
    """

    def __init__(self, A, interval, degree: int = 10, sigma: float = 0.0):
        self.A = A if isinstance(A, LinearOperator) else aslinearoperator(A)
        rdt = jnp.zeros((), self.A.dtype).real.dtype
        a, b = interval
        self.a = jnp.asarray(a, rdt)
        self.b = jnp.asarray(b, rdt)
        self.sigma = jnp.asarray(sigma, rdt)
        self.degree = int(degree)
        self.shape = self.A.shape
        self.dtype = self.A.dtype

    @classmethod
    def from_operator(cls, A, degree: int = 10, lower_frac: float = 0.05,
                      sigma: float = 0.0, power_iters: int = 20, seed: int = 0):
        """Build with the interval estimated on the host: ``b`` from a
        short power iteration on A (x1.05 safety), ``a = lower_frac * b``
        (the wanted eigenvalues must lie below ``a``)."""
        Aop = A if isinstance(A, LinearOperator) else aslinearoperator(A)
        n = Aop.shape[0]
        key = jax.random.PRNGKey(seed)
        rdt = jnp.zeros((), Aop.dtype).real.dtype
        x = jax.random.normal(key, (n, 1), rdt).astype(Aop.dtype)
        lam = jnp.ones((), rdt)
        for _ in range(power_iters):
            y = Aop.matmat(x)
            lam = jnp.linalg.norm(y)
            x = y / jnp.maximum(lam, jnp.finfo(rdt).tiny)
        b = 1.05 * float(lam)
        return cls(Aop, (lower_frac * b, b), degree=degree, sigma=sigma)

    def _leaves(self):
        return (self.A, self.a, self.b, self.sigma)

    def _aux(self):
        return (self.degree, self.shape, str(jnp.dtype(self.dtype)))

    def _init_from(self, leaves, aux):
        self.A, self.a, self.b, self.sigma = leaves
        self.degree, self.shape, dt = aux
        self.dtype = jnp.dtype(dt)

    def matmat(self, X):
        theta = 0.5 * (self.b + self.a)
        delta = 0.5 * (self.b - self.a)
        sig1 = theta / delta
        sh = self.sigma.astype(self.dtype)

        def op(Z):
            return self.A.matmat(Z) - sh * Z

        d = (X / theta.astype(self.dtype))
        z0 = d
        rho0 = 1.0 / sig1

        def body(_, carry):
            z, d, rho = carry
            r = X - op(z)
            rho_n = 1.0 / (2.0 * sig1 - rho)
            d = (rho_n * rho).astype(self.dtype) * d \
                + (2.0 * rho_n / delta).astype(self.dtype) * r
            return z + d, d, rho_n

        z, _, _ = jax.lax.fori_loop(0, self.degree - 1, body,
                                    (z0, d, rho0))
        return z


def apply_precond(K: Optional[LinearOperator], X: jax.Array,
                  shifts: Optional[jax.Array] = None) -> jax.Array:
    """Uniform preconditioner application; identity if ``K is None``.

    Mirrors ``applyPreconditioner_Sprimme`` mediation
    (``src/eigs/auxiliary_eigs.c``).
    """
    if K is None:
        return X
    with jax.named_scope("pt_precond"):   # timePrecond attribution
        if shifts is not None and hasattr(K, "matmat_shifted"):
            return K.matmat_shifted(X, shifts)
        return K.matmat(X)


def aslinearoperator(A: Any) -> LinearOperator:
    """Coerce numpy/jax dense arrays, scipy sparse, or LinearOperator."""
    if isinstance(A, LinearOperator):
        return A
    try:
        import scipy.sparse as sp

        if sp.issparse(A):
            # MXU roofline: TPU gathers run ~1 Gnnz/s (measured) while a
            # dense matmul streams n*m*itemsize at HBM peak, so below
            # ~8k rows densifying a sparse matrix is FASTER than any
            # gather-based sparse format, at any realistic sparsity —
            # the TPU-native answer to "small unstructured matrix".
            nr, mc = A.shape
            if (max(nr, mc) <= 8192
                    and nr * mc * A.dtype.itemsize <= (256 << 20)):
                return DenseOperator(jnp.asarray(A.toarray()))
            return ELLOperator.from_scipy(A)
    except ImportError:  # pragma: no cover
        pass
    import scipy.sparse.linalg as spla

    if isinstance(A, spla.LinearOperator):
        shape, dtype = A.shape, A.dtype

        def f(X):
            return jax.pure_callback(
                lambda Xh: np.asarray(A.matmat(np.asarray(Xh)), dtype=dtype),
                jax.ShapeDtypeStruct((shape[0], X.shape[1]), dtype), X,
                vmap_method="sequential")

        def rf(X):
            return jax.pure_callback(
                lambda Xh: np.asarray(A.rmatmat(np.asarray(Xh)), dtype=dtype),
                jax.ShapeDtypeStruct((shape[1], X.shape[1]), dtype), X,
                vmap_method="sequential")

        return FunctionOperator(f, shape, dtype, rf=rf)
    arr = jnp.asarray(A)
    if arr.ndim != 2:
        raise ValueError("expected a 2-D operator")
    return DenseOperator(arr)


@jax.tree_util.register_pytree_node_class
class BandedOperator(LinearOperator):
    """DIA (diagonal) sparse operator: ``offsets`` (static) + per-diagonal
    value rows. Matvec is a sum of shifted elementwise products — zero
    index traffic, pure VPU, and under row sharding the shifts lower to
    neighbor ``ppermute`` halo exchanges. The TPU-preferred layout for
    banded matrices (finite differences/elements, lattice Hamiltonians);
    for unstructured matrices reorder (e.g. RCM) toward bandedness or use
    :class:`ELLOperator`."""

    def __init__(self, offsets, vals, shape=None):
        # offsets: tuple of python ints (static); vals: [B, n]
        self.offsets = tuple(int(o) for o in offsets)
        self.vals = jnp.asarray(vals)
        n = self.vals.shape[1]
        self.shape = tuple(shape) if shape is not None else (n, n)
        self.dtype = self.vals.dtype

    def _leaves(self):
        return (self.vals,)

    def _aux(self):
        return (self.offsets, self.shape)

    def _init_from(self, leaves, aux):
        (self.vals,) = leaves
        self.offsets, self.shape = aux
        self.dtype = self.vals.dtype

    def matmat(self, X):
        # y_i = sum_b vals[b, i] * x_{i + off_b}; entries off the edge are 0.
        # jnp.pad (not concatenate) — XLA fuses pads into the elementwise
        # sum, ~20x faster on TPU than materialized concats.
        out = jnp.zeros_like(X)
        for b, off in enumerate(self.offsets):
            v = self.vals[b][:, None]
            if off == 0:
                out = out + v * X
            elif off > 0:
                out = out + v * jnp.pad(X[off:], ((0, off), (0, 0)))
            else:
                out = out + v * jnp.pad(X[:off], ((-off, 0), (0, 0)))
        return out

    def rmatmat(self, X):
        # A^H: diagonal at offset o with values v_i (stored at row i)
        # contributes conj(v) on offset -o at shifted positions.
        out = jnp.zeros_like(X)
        for b, off in enumerate(self.offsets):
            v = self.vals[b].conj()
            if off == 0:
                out = out + v[:, None] * X
            elif off > 0:
                # y_{i+off} += conj(vals[b, i]) x_i
                xs = jnp.pad(X[:-off], ((off, 0), (0, 0)))
                vs = jnp.pad(v[:-off], (off, 0))
                out = out + vs[:, None] * xs
            else:
                o = -off
                xs = jnp.pad(X[o:], ((0, o), (0, 0)))
                vs = jnp.pad(v[o:], (0, o))
                out = out + vs[:, None] * xs
        return out

    def diagonal(self):
        if 0 in self.offsets:
            return self.vals[self.offsets.index(0)]
        return jnp.zeros((self.shape[0],), self.dtype)

    @staticmethod
    def from_scipy(A) -> "BandedOperator":
        import scipy.sparse as sp

        D = sp.dia_matrix(A)
        n = A.shape[0]
        offsets = [int(o) for o in D.offsets]
        vals = np.zeros((len(offsets), n), dtype=D.dtype)
        # scipy dia stores data[b, j] = A[j - off, j]; we want row-indexed:
        # vals[b, i] = A[i, i + off]
        for b, off in enumerate(offsets):
            if off >= 0:
                m = n - off
                vals[b, :m] = D.data[b, off:off + m]
            else:
                m = n + off
                vals[b, -off:] = D.data[b, :m]
        return BandedOperator(offsets, vals, shape=A.shape)


@jax.tree_util.register_pytree_node_class
class SumOperator(LinearOperator):
    """``y = sum_i A_i x`` — composes partial operators. Used for the
    DIA+ELL hybrid split of a general sparse matrix: the dense diagonals
    apply at shift speed (near HBM peak), only the scattered remainder
    pays the gather tax (TPU gathers measure ~1 Gnnz/s)."""

    def __init__(self, ops):
        self.ops = tuple(ops)
        self.shape = self.ops[0].shape
        self.dtype = self.ops[0].dtype

    def _leaves(self):
        return self.ops

    def _aux(self):
        return len(self.ops)

    def _init_from(self, leaves, aux):
        self.ops = tuple(leaves)
        self.shape = self.ops[0].shape
        self.dtype = self.ops[0].dtype

    def matmat(self, X):
        y = self.ops[0].matmat(X)
        for op in self.ops[1:]:
            y = y + op.matmat(X)
        return y

    def rmatmat(self, X):
        y = self.ops[0].rmatmat(X)
        for op in self.ops[1:]:
            y = y + op.rmatmat(X)
        return y

    def diagonal(self):
        # a BandedOperator without a 0-offset stores a zero diagonal
        total = None
        for op in self.ops:
            d = op.diagonal()
            if d is None and isinstance(op, BandedOperator):
                continue
            if d is None:
                return None
            total = d if total is None else total + d
        return total


def dia_ell_hybrid(A, max_diags: int = 256, min_fill: float = 0.25,
                   min_coverage: float = 0.5):
    """Split a sparse matrix into dense-ish diagonals (DIA, shift-based
    matvec) plus a scattered remainder (ELL, gather): offsets whose
    occupancy is at least ``min_fill`` become the banded part; accept the
    split when it covers at least ``min_coverage`` of the nnz. Returns a
    :class:`SumOperator` or ``None``."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    if A.shape[0] != A.shape[1] or A.nnz == 0:
        return None
    C = A.tocoo()
    d = C.col - C.row
    offs_all, inv, counts = np.unique(d, return_inverse=True,
                                      return_counts=True)
    occ = counts / n
    good = occ >= min_fill
    # main diagonal always goes to the banded part (keeps diagonal() exact)
    good |= offs_all == 0
    if good.sum() == 0 or good.sum() > max_diags:
        return None
    if counts[good].sum() < min_coverage * A.nnz:
        return None
    sel = good[inv]
    offsets = tuple(int(o) for o in offs_all[good])
    vals = np.zeros((len(offsets), n), dtype=A.dtype)
    band_of = np.searchsorted(offs_all[good], d[sel])
    vals[band_of, C.row[sel]] = C.data[sel]
    banded = BandedOperator(offsets, vals, shape=A.shape)
    rem_nnz = int((~sel).sum())
    if rem_nnz == 0:
        return banded
    rem = sp.coo_matrix((C.data[~sel], (C.row[~sel], C.col[~sel])),
                        shape=A.shape)
    return SumOperator([banded, ELLOperator.from_scipy(rem)])



@jax.tree_util.register_pytree_node_class
class WindowedELLOperator(LinearOperator):
    """Band-reducible sparse operator on the Pallas windowed-slot gather
    kernel (``ops/pallas_windowed.py``): nnz binned by diagonal offset so
    every gather is a hardware [8, 128] lane shuffle over a per-bucket
    band window. ~19x the XLA ELL gather device time at 2.9M nnz
    (measured); applicability decided at pack time (the band window must
    fit VMEM), else ``from_scipy`` returns None and callers fall back.

    Symmetric matrices only (``rmatmat`` aliases ``matmat``). f32
    compute; f64 runs as an f32x2 double-single stream with compensated
    in-kernel accumulation (``pallas_windowed.matmat_ds`` — Mosaic has
    no 64-bit vectors), accurate to ~1e-14 relative.
    """

    def __init__(self, scal, offs, vals, meta, vals_lo=None):
        self.scal = jnp.asarray(scal, jnp.int32)
        self.offs = jnp.asarray(offs, jnp.int32)
        self.vals = jnp.asarray(vals, jnp.float32)
        self.vals_lo = (None if vals_lo is None
                        else jnp.asarray(vals_lo, jnp.float32))
        self.meta = tuple(int(x) for x in meta)   # nrb, S, npad, n, pad, WB
        n = self.meta[3]
        self.shape = (n, n)
        self.dtype = jnp.dtype(jnp.float64 if vals_lo is not None
                               else jnp.float32)

    def _leaves(self):
        return (self.scal, self.offs, self.vals, self.vals_lo)

    def _aux(self):
        return self.meta

    def _init_from(self, leaves, aux):
        self.scal, self.offs, self.vals, self.vals_lo = leaves
        self.meta = aux
        n = aux[3]
        self.shape = (n, n)
        self.dtype = jnp.dtype(jnp.float64 if self.vals_lo is not None
                               else jnp.float32)

    @staticmethod
    def from_scipy(A):
        from .ops import pallas_windowed as PW

        dt = (np.float64 if np.dtype(A.dtype) == np.dtype(np.float64)
              else np.float32)
        packed = PW.pack(A, dtype=dt)
        if packed is None:
            return None
        return WindowedELLOperator(
            packed.scal, packed.offs, packed.vals,
            (packed.nrb, packed.S, packed.npad, packed.n, packed.pad,
             packed.WB), vals_lo=packed.vals_lo)

    def matmat(self, X):
        from .ops import pallas_windowed as PW

        nrb, S, npad, n, pad, WB = self.meta
        if self.vals_lo is not None:
            out = PW.matmat_ds(nrb, S, npad, n, pad, WB,
                               self.scal, self.offs, self.vals,
                               self.vals_lo, X)
        else:
            out = PW.matmat(nrb, S, npad, n, pad, WB,
                            self.scal, self.offs, self.vals, X)
        return out.astype(X.dtype)

    def diagonal(self):
        # diagonal entries live at off_rel positions matching col == row;
        # cheapest correct route: reconstruct via matvec on basis of ones
        # is wasteful — instead gather from vals where offsets hit the
        # diagonal, done on host at pack time would be better; fall back
        # to None (caller uses explicit diag if needed).
        return None


def rcm_banded(A, max_diags: int = 256, fill_factor: float = 32.0,
               mem_cap_bytes: int = 1 << 30):
    """Turn a scipy sparse matrix into a :class:`BandedOperator` if its
    diagonal profile (natural or after reverse Cuthill-McKee reordering)
    is narrow enough.

    TPU gathers run ~2 orders of magnitude below HBM peak while
    shift-based (DIA) matvecs run near it, so even a heavily padded DIA
    layout wins: fill up to ``fill_factor`` x nnz is accepted (capped by
    ``mem_cap_bytes``). Returns ``(BandedOperator, perm-or-None)`` or
    ``None``; a non-None perm means the operator acts on P A P^T and the
    caller must permute inputs / un-permute outputs
    (:func:`primme_tpu.api.eigsh`)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = sp.csr_matrix(A)
    n = A.shape[0]
    if A.shape[0] != A.shape[1]:
        return None

    def _accept(M):
        C = M.tocoo()
        offs = np.unique(C.col - C.row)
        ok = (len(offs) <= max_diags
              and len(offs) * n <= fill_factor * max(M.nnz, 1)
              and len(offs) * n * M.dtype.itemsize <= mem_cap_bytes)
        return offs if ok else None

    # natural ordering first (grid problems are already diagonal-sparse)
    if _accept(A) is not None:
        return BandedOperator.from_scipy(A.todia()), None
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    Ap = A[perm][:, perm]
    if _accept(Ap) is not None:
        return BandedOperator.from_scipy(Ap.todia()), perm
    # partial-band hybrid: dense diagonals at shift speed + gather
    # remainder (most of the nnz dodge the ~1 Gnnz/s gather tax)
    h = dia_ell_hybrid(A, max_diags=max_diags)
    if h is not None:
        return h, None
    hp = dia_ell_hybrid(Ap, max_diags=max_diags)
    if hp is not None:
        return hp, perm
    # windowed-slot Pallas gather: any RCM-band-reducible sparsity at
    # ~19x the plain ELL gather (ops/pallas_windowed.py); rejected at
    # pack time when the band window exceeds the VMEM budget. f64 inputs
    # run the f32x2 double-single kernel (matmat_ds, ~1e-14 relative —
    # full double-precision capability, round-4); small matrices are
    # served better by the dense/DIA paths.
    if A.dtype in (np.float32, np.float64) and n >= 4096:
        won = WindowedELLOperator.from_scipy(Ap)
        if won is not None:
            return won, perm
    # block-ELL: nnz clustered in b x b tiles (FEM-like) but not on
    # diagonals — panel gathers + batched dense blocks on the MXU beat
    # the per-element ELL gather when the tiles are reasonably full
    Cp = Ap.tocoo()
    for b in (8, 4):
        nblk = len(np.unique(
            (Cp.row // b).astype(np.int64) * (-(-n // b)) + Cp.col // b))
        stored = nblk * b * b
        if stored <= 6.0 * A.nnz and stored * A.dtype.itemsize <= mem_cap_bytes:
            return BlockELLOperator.from_scipy(Ap, block_size=b), perm
    return None


@jax.tree_util.register_pytree_node_class
class CastOperator(LinearOperator):
    """Run a user operator at its own precision while the solver works in
    another (the reference's ``internalPrecision`` boundary: user arrays
    are cast at the matvec mediation layer, ``matrixMatvec_Sprimme``,
    ``src/eigs/auxiliary_eigs.c``)."""

    def __init__(self, op: LinearOperator, dtype):
        self.op = op
        self.dtype = jnp.dtype(dtype)
        self.shape = op.shape

    def tree_flatten(self):
        return (self.op,), str(self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], jnp.dtype(aux))

    def matmat(self, X):
        return self.op.matmat(X.astype(self.op.dtype)).astype(self.dtype)

    def rmatmat(self, X):
        return self.op.rmatmat(X.astype(self.op.dtype)).astype(self.dtype)

    def matmat_shifted(self, X, shifts):
        from . import operators as _  # noqa: F401
        if hasattr(self.op, "matmat_shifted"):
            return self.op.matmat_shifted(
                X.astype(self.op.dtype),
                shifts.astype(jnp.zeros((), self.op.dtype).real.dtype)
            ).astype(self.dtype)
        return self.matmat(X)

    def diagonal(self):
        d = self.op.diagonal()
        return None if d is None else d.astype(self.dtype)
