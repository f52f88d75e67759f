"""Pallas TPU kernel: banded (DIA) SpMM  y = A x  with A in diagonal form.

The XLA lowering of the shift-and-multiply-add formulation materializes the
shifted copies of ``X [n, k]`` with the minor dimension padded to the
128-lane tile, wasting ~128/k of the bandwidth for the narrow blocks an
eigensolver uses (k = 1..16). This kernel instead:

* keeps a row *window* of X (tile + halo) in VMEM via one contiguous
  manual DMA per tile — HBM traffic is packed rows, no lane padding;
* accumulates all B diagonals in-register over the window with static
  slice offsets (the offsets are compile-time constants);
* streams the diagonal values with a plain blocked spec.

``y[i, :] = sum_b vals[b, i] * x[i + off_b, :]`` for row tile
``[iT, (i+1)T)`` needs x rows ``[iT - H, (i+1)T + H)`` where
``H = max|off|``; the wrapper zero-pads X by H on both sides so every
window read is in-bounds.

STATUS: the column-major kernel (`banded_matmat_pallas`) hits the Mosaic
128-lane constraint — HBM slices whose minor dimension is not 128-aligned
("Slice shape along dimension 1 must be aligned to tiling (128)") are
refused, so it runs in interpret mode only. The lane-major variant
(`banded_matmat_pallas_T`, X stored ``[k, n]``) is Mosaic-legal by
construction and VALIDATED ON REAL TPU HARDWARE (v5e, 2026-08-17):
compiles clean and matches the XLA formulation bit-exactly at
n=2^20, B=7, blk∈{1,4,8}. At those sizes every path measures at the
~1.4 ms axon dispatch floor, so path selection stays end-to-end-driven:
BandedOperator keeps the XLA pad-shift path (which already fuses the
whole diagonal sum into one kernel) until a full lane-major solver
layout makes the packed-DMA win visible end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets, T, H, B, k, vals_ref, xpad_hbm, o_ref, xwin, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        xpad_hbm.at[pl.ds(i * T, T + 2 * H)], xwin, sem)
    cp.start()
    cp.wait()
    acc = vals_ref[0, :][:, None] * xwin[pl.ds(H + offsets[0], T), :]
    for b in range(1, B):
        acc += vals_ref[b, :][:, None] * xwin[pl.ds(H + offsets[b], T), :]
    o_ref[:] = acc


def _kernel_T(offsets, T, H128, B, vals_ref, xpad_hbm, o_ref, xwin, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        xpad_hbm.at[:, pl.ds(i * T, T + 2 * H128)], xwin, sem)
    cp.start()
    cp.wait()
    acc = vals_ref[0, :][None, :] * xwin[:, pl.ds(H128 + offsets[0], T)]
    for b in range(1, B):
        acc += vals_ref[b, :][None, :] * xwin[:, pl.ds(H128 + offsets[b], T)]
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(0, 3))
def banded_matmat_pallas_T(offsets: tuple, vals: jax.Array, Xt: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Lane-major packed-DMA banded SpMM: ``Xt [k, n]`` (vectors as ROWS,
    the long dimension on the 128-lane axis), ``vals [B, n]`` DIA values.

    Mosaic-legal by construction: every HBM slice is along the minor
    (lane) axis at 128-aligned offsets/sizes (tile T and halo H128 are
    multiples of 128), so the window DMA moves packed rows with zero
    lane padding — the layout the column-major ``[n, k<128]`` storage
    could never provide (see module docstring). The per-diagonal shifts
    become static VMEM lane slices inside the window.

    Rows out of range contribute zero (Dirichlet edges), matching
    :class:`primme_tpu.operators.BandedOperator`.
    """
    B, n = vals.shape
    k = Xt.shape[0]
    H = max(1, max(abs(int(o)) for o in offsets))
    H128 = -(-H // 128) * 128
    T = max(1024, 2 * H128)
    T = -(-T // 128) * 128
    npad = -(-n // T) * T
    xpad = jnp.zeros((k, npad + 2 * H128), Xt.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, Xt, (0, H128))
    vpad = (jnp.zeros((B, npad), vals.dtype).at[:, :n].set(vals)
            if npad != n else vals)
    nt = npad // T

    out = pl.pallas_call(
        functools.partial(_kernel_T, tuple(int(o) for o in offsets),
                          T, H128, B),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((B, T), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, T), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, npad), Xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, T + 2 * H128), Xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(vpad, xpad)
    return out[:, :n]


@functools.partial(jax.jit, static_argnums=(0, 3))
def banded_matmat_pallas(offsets: tuple, vals: jax.Array, X: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """y = A @ X for a DIA operator (``vals [B, n]``, static ``offsets``).

    ``X: [n, k]``. Rows out of range contribute zero (Dirichlet edges),
    matching :class:`primme_tpu.operators.BandedOperator`.
    """
    B, n = vals.shape
    k = X.shape[1]
    H = max(1, max(abs(int(o)) for o in offsets))
    # tile: cover the halo at least twice over; multiple of 8 sublanes
    T = max(512, 2 * H)
    T = -(-T // 8) * 8
    npad = -(-n // T) * T
    xpad = jnp.zeros((npad + 2 * H, k), X.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, X, (H, 0))
    vpad = (jnp.zeros((B, npad), vals.dtype).at[:, :n].set(vals)
            if npad != n else vals)
    nt = npad // T

    out = pl.pallas_call(
        functools.partial(_kernel, tuple(int(o) for o in offsets), T, H, B, k),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((B, T), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, k), X.dtype),
        scratch_shapes=[
            pltpu.VMEM((T + 2 * H, k), X.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(vpad, xpad)
    return out[:n]
