"""Distributed sparse operators: row-partitioned SpMM with halo exchange.

The reference's entire parallel model is a 1-D row partition where each
rank owns ``nLocal`` rows and the *user's* matvec communicates only
boundary data (``include/primme_eigs.h:188-198``; the PETSc test driver
``tests/COMMON/petscw.c`` is the canonical halo-exchanging
implementation). The framework's general sparse formats
(:class:`~primme_tpu.operators.ELLOperator` etc.) gather with global
column indices, which under a mesh makes GSPMD all-gather the whole
``[n, k]`` vector block every matvec — O(n*k) traffic where the
reference moves O(halo).

:class:`HaloELLOperator` restores the reference's communication
contract TPU-natively: rows are sharded over a 1-D mesh, column indices
are stored relative to a per-shard *window* ``[shard_start - h,
shard_start + n_local + h)``, and the matvec runs under ``shard_map``,
exchanging exactly the ``h``-row boundary segments with the two
neighbors via ``lax.ppermute`` (one hop over ICI) before a purely local
ELL gather. Per-matvec communication is ``2*h*k`` elements per shard —
O(halo*k), independent of n.

Applicability is decided at pack time: the (optionally RCM-reordered)
matrix must have all its nnz within one-shard reach (``h <= n_local``).
Matrices that defeat this fall back to the global-gather formats.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .operators import LinearOperator


@jax.tree_util.register_pytree_node_class
class HaloELLOperator(LinearOperator):
    """Row-partitioned ELL sparse operator with single-hop halo exchange.

    ``cols``: int32 ``[n, w]`` *window-relative* column indices — row
    ``r`` of shard ``d`` stores ``col - (d*n_local - h)``, so every
    index addresses the local ``[n_local + 2h, k]`` window built from
    the left halo ++ local block ++ right halo. Padding entries carry
    ``vals == 0`` and index ``h`` (the first local row — always valid).

    Hermitian operators only on the adjoint path (``rmatmat`` is the
    base-class ``matmat`` alias), which is what ``eigsh`` needs; the
    matvec itself is general.
    """

    def __init__(self, cols, vals, diag, shape, halo: int,
                 mesh=None, axis: Optional[str] = None,
                 hrows: Optional[int] = None):
        self.cols = jnp.asarray(cols, jnp.int32)
        self.vals = jnp.asarray(vals)
        self.diag = None if diag is None else jnp.asarray(diag)
        self.shape = tuple(shape)
        self.halo = int(halo)
        self.mesh = mesh
        self.axis = axis if axis is not None else (
            mesh.axis_names[0] if mesh is not None else None)
        # boundary-row thickness: rows further than ``hrows`` from either
        # shard edge are guaranteed to reference only the local block
        # (computed at pack time); None disables the overlap split.
        self.hrows = None if hrows is None else int(hrows)
        self.dtype = self.vals.dtype

    def _leaves(self):
        return (self.cols, self.vals, self.diag)

    def _aux(self):
        return (self.shape, self.halo, self.mesh, self.axis, self.hrows)

    def _init_from(self, leaves, aux):
        self.cols, self.vals, self.diag = leaves
        (self.shape, self.halo, self.mesh, self.axis,
         *rest) = aux
        self.hrows = rest[0] if rest else None
        self.dtype = self.vals.dtype

    # -- local (per-shard) kernel ---------------------------------------
    def _local_apply(self, cols, vals, x):
        """One shard: exchange h-row halos with the two neighbors and
        gather/FMA from the [n_local + 2h, k] window. The only
        communication is the two ppermutes — 2*h*k elements, the
        reference's O(halo) contract (petscw.c's VecScatter equivalent)
        riding ICI.

        Communication/computation OVERLAP: only the ``hrows`` rows at
        each shard edge can hold halo entries, so the interior
        ``n_local - 2*hrows`` rows' gather/FMA takes ``x`` alone — its
        HLO has no data dependency on the collective-permutes, and the
        TPU scheduler runs it between the async permute start/done pair
        while the boundary segments are in flight (the structural
        prerequisite for the BASELINE ">=80% scaling" target; asserted
        on the compiled jaxpr in tests/test_distributed.py)."""
        h = self.halo
        nl = x.shape[0]
        if h == 0:
            return jnp.einsum("nw,nwk->nk", vals, x[cols])
        nsh = self.mesh.devices.size
        # no wraparound: edge shards read zeros (only padding entries
        # can index there, and their values are zero)
        to_right = [(i, i + 1) for i in range(nsh - 1)]
        to_left = [(i + 1, i) for i in range(nsh - 1)]
        left = jax.lax.ppermute(x[-h:], self.axis, to_right)
        right = jax.lax.ppermute(x[:h], self.axis, to_left)
        hr = self.hrows
        if hr is None or 2 * hr >= nl:
            # no interior to overlap — original exchange-then-compute
            xw = jnp.concatenate([left, x, right], axis=0)
            return jnp.einsum("nw,nwk->nk", vals, xw[cols])
        # interior rows: window indices shifted into the local block —
        # independent of the exchanged halos by construction
        ci = jnp.clip(cols[hr:nl - hr] - h, 0, nl - 1)
        yi = jnp.einsum("nw,nwk->nk", vals[hr:nl - hr], x[ci])
        # boundary rows: full window (left halo ++ local ++ right halo)
        xw = jnp.concatenate([left, x, right], axis=0)
        yt = jnp.einsum("nw,nwk->nk", vals[:hr], xw[cols[:hr]])
        yb = jnp.einsum("nw,nwk->nk", vals[nl - hr:], xw[cols[nl - hr:]])
        return jnp.concatenate([yt, yi, yb], axis=0)

    def matmat(self, X):
        if self.mesh is None or self.mesh.devices.size == 1:
            # unsharded: the window is just the zero-padded block
            h = self.halo
            xw = jnp.pad(X, ((h, h), (0, 0))) if h else X
            g = xw[self.cols]
            return jnp.einsum("nw,nwk->nk", self.vals, g)
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        spec = P(self.axis, None)
        fn = shard_map(self._local_apply, mesh=self.mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
        return fn(self.cols, self.vals, X)

    def diagonal(self):
        return self.diag

    # -- packing ---------------------------------------------------------
    @staticmethod
    def _halo_width(A, nl: int) -> int:
        """Max reach of any nnz outside its row's shard block."""
        C = A.tocoo()
        if C.nnz == 0:
            return 0
        start = (C.row // nl).astype(np.int64) * nl
        below = start - C.col
        above = C.col - (start + nl - 1)
        return int(max(0, below.max(initial=0), above.max(initial=0)))

    @staticmethod
    def from_scipy(A, mesh, try_rcm: bool = True
                   ) -> Optional[Tuple["HaloELLOperator",
                                       Optional[np.ndarray]]]:
        """Pack a scipy sparse matrix for ``mesh``'s 1-D row partition.

        Returns ``(operator, perm-or-None)`` — a non-None ``perm`` means
        the operator acts on ``P A P^T`` (reverse Cuthill-McKee, applied
        to shrink the halo) and the caller must permute inputs / inverse-
        permute outputs, exactly like :func:`operators.rcm_banded`.
        Returns ``None`` when the partition cannot satisfy the one-hop
        contract (n not a shard multiple, or halo > n_local even after
        RCM).
        """
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n = A.shape[0]
        nsh = int(mesh.devices.size) if mesh is not None else 1
        if A.shape[0] != A.shape[1] or n % nsh != 0:
            return None
        nl = n // nsh
        perm = None
        h = HaloELLOperator._halo_width(A, nl)
        if try_rcm:
            from scipy.sparse.csgraph import reverse_cuthill_mckee
            p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
            Ap = A[p][:, p]
            hp = HaloELLOperator._halo_width(Ap, nl)
            if hp < h:
                A, h, perm = Ap.tocsr(), hp, p
        if h > nl:
            return None

        # ELL pack with window-relative columns
        row_nnz = np.diff(A.indptr)
        w = max(int(row_nnz.max()), 1)
        cols = np.full((n, w), h, dtype=np.int32)   # padding -> local row 0
        vals = np.zeros((n, w), dtype=A.dtype)
        rows = np.repeat(np.arange(n), row_nnz)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], row_nnz)
        win_start = (rows // nl).astype(np.int64) * nl - h
        cols[rows, offs] = (A.indices - win_start).astype(np.int32)
        vals[rows, offs] = A.data

        # boundary-row thickness for the overlap split: the max distance
        # from a shard edge of any row holding a halo entry (+1). Rows
        # deeper inside the block provably reference local data only, so
        # their gather/FMA can run while the halo ppermute is in flight.
        hrows = 0
        if h > 0 and A.nnz:
            start = (rows // nl).astype(np.int64) * nl
            is_halo = (A.indices < start) | (A.indices >= start + nl)
            if is_halo.any():
                l = (rows[is_halo] % nl).astype(np.int64)
                hrows = int(np.minimum(l, nl - 1 - l).max()) + 1
        op = HaloELLOperator(cols, vals, A.diagonal(), A.shape, h,
                             mesh=mesh, hrows=hrows)
        return op, perm
