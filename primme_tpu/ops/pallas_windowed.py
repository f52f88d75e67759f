"""Windowed-slot ELL SpMM: the Pallas gather path for band-reducible
sparse matrices.

TPU has no general gather hardware — XLA lowers an ELL gather at ~0.1
Gnnz/s (measured: 10.5 ms per 4-column SpMM on a 110k-row, 2.9M-nnz
RCM-reordered 27-point Laplacian). The usable primitive is
``tpu.dynamic_gather``: a lane shuffle within a single [8, 128] tile
(``jnp.take_along_axis`` with same-shape operands, axis=1). This kernel
restructures a bandwidth-bounded sparse matrix so every gather is exactly
that primitive:

* nnz are binned by diagonal offset (col - row) into BINW-wide bins and
  stored slot-ELL per (1024-row bucket, bin): each slot's 1024 offsets
  reshape to one [8, 128] index tile;
* the vector block is expanded (cheap XLA slices) into 8 shifted copies
  ``XS[j, i, m] = X[m + 128 i - pad, j]`` so each sublane row's table
  base alignment is baked into the data: a slot needs only a
  ``(BINW + 256)/128``-chunk scan over STATIC 128-lane tables;
* the per-bucket band window arrives as ONE pipeline block selected by a
  scalar-prefetched BlockSpec index map (the embedding-lookup pattern),
  so the tiled HBM layout streams at full bandwidth — no ANY-space
  relayout (measured: a computed rank-3 operand handed to an ANY input
  costs a 24 ms row-major relayout; ``jnp.roll`` in the feed is equally
  pathological — use static slices).

Measured (v5e, 110592 rows, 2.9M nnz, k=4): 0.55 ms device / 1.75 ms
chained-wall per SpMM vs 10.5 ms for the XLA ELL gather — ~19x device,
~6x wall. Applicability is decided at pack time: the per-bucket band
window must fit the VMEM budget (band-reducible matrices — FEM/graph
after RCM; a randomly scattered matrix is rejected and the caller falls
back to plain ELL).

Reference capability bar: the test harness's CSR ``amux``
(``tests/COMMON/matvec.f``) runs any sparsity at memory speed on CPU;
this is the TPU counterpart for the RCM-reducible class.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

RB = 1024            # rows per bucket (8 sublane rows x 128 lanes)
BINW = 256           # diagonal-offset bin width
WREL = BINW + 256    # per-slot relative offset range
NCH = WREL // 128    # chunk scan length
RT = RB // 128
WBLK = 8192          # window block quantum (lanes)
MAX_WB = 49152       # VMEM guard for the double-buffered window block


class WindowedELL(NamedTuple):
    scal: np.ndarray    # [nrb + nrb*S] i32: window block idx ++ rel bases
    offs: np.ndarray    # [nrb, S, RT, 128] i32 relative offsets
    vals: np.ndarray    # [nrb, S, RT, 128] f32 (leading/high part)
    nrb: int
    S: int
    npad: int
    n: int
    pad: int
    WB: int             # window width (lanes, multiple of WBLK)
    vals_lo: Optional[np.ndarray] = None   # f32 tail: f64 = hi + lo


def pack(A, dtype=np.float32) -> Optional[WindowedELL]:
    """Pack a scipy sparse matrix; returns None when the matrix is not
    band-reducible enough for the VMEM window budget (caller falls back
    to another format).

    ``dtype=np.float64``: Mosaic has no 64-bit vectors, so double
    precision is carried as an f32x2 double-single pair (``vals`` = hi,
    ``vals_lo`` = tail) and the kernel runs compensated (error-free
    transformation) accumulation — see :func:`matmat`. The VMEM window
    budget halves (two window buffers stream instead of one)."""
    import scipy.sparse as sp

    C = sp.coo_matrix(A)
    if C.shape[0] != C.shape[1]:
        return None
    f64 = np.dtype(dtype) == np.dtype(np.float64)
    n = C.shape[0]
    nrb = -(-n // RB)
    npad = nrb * RB
    r = C.row.astype(np.int64)
    c = C.col.astype(np.int64)
    v = C.data.astype(np.float32)
    vlo = (C.data.astype(np.float64)
           - v.astype(np.float64)).astype(np.float32) if f64 else None
    d = c - r
    dmin = int(d.min())
    binid = (d - dmin) // BINW
    nb = int(binid.max()) + 1
    bucket = r // RB

    order = np.lexsort((c, binid, r))
    r2, c2, v2 = r[order], c[order], v[order]
    vlo2 = vlo[order] if f64 else None
    b2, g2 = bucket[order], binid[order]
    grp = r2 * nb + g2
    new = np.ones(len(grp), bool)
    new[1:] = grp[1:] != grp[:-1]
    gidx = np.cumsum(new) - 1
    sizes = np.zeros(gidx[-1] + 1, np.int64)
    np.add.at(sizes, gidx, 1)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    rank = np.arange(len(grp)) - starts[gidx]

    cnt = np.zeros((n, nb), np.int32)
    np.add.at(cnt, (r, binid), 1)
    S_per = np.zeros((nrb, nb), np.int32)
    for bkt in range(nrb):
        S_per[bkt] = cnt[bkt * RB:(bkt + 1) * RB].max(axis=0)
    S = -(-int(S_per.sum(axis=1).max()) // 8) * 8
    if S * RB * nrb > 16 * max(C.nnz, 1):
        return None        # slot padding explosion: not worth this path
    slot_off = np.zeros((nrb, nb), np.int32)
    for bkt in range(nrb):
        slot_off[bkt] = np.concatenate([[0], np.cumsum(S_per[bkt])[:-1]])

    slot = slot_off[b2, g2] + rank
    rloc = r2 - b2 * RB

    pad = max(0, -((dmin // 128) * 128)) + 128
    bases = np.zeros((nrb, S), np.int32)
    used = np.zeros((nrb, S), bool)
    for bkt in range(nrb):
        for g in range(nb):
            s0, ct = slot_off[bkt, g], S_per[bkt, g]
            if ct == 0:
                continue
            bases[bkt, s0:s0 + ct] = (bkt * RB + dmin + g * BINW) // 128 * 128
            used[bkt, s0:s0 + ct] = True
    # padded/unused slots must not widen the bucket window: park them on
    # the bucket's first used base (their vals are 0, contribution 0)
    for bkt in range(nrb):
        if used[bkt].any():
            first = bases[bkt][used[bkt]][0]
            bases[bkt][~used[bkt]] = first

    offs = np.zeros((nrb, S, RB), np.int32)
    vals = np.zeros((nrb, S, RB), np.float32)
    off_rel = c2 - bases[b2, slot] - (rloc // 128) * 128
    assert off_rel.min() >= 0 and off_rel.max() < WREL
    offs[b2, slot, rloc] = off_rel
    vals[b2, slot, rloc] = v2
    vals_lo = None
    if f64:
        vals_lo = np.zeros((nrb, S, RB), np.float32)
        vals_lo[b2, slot, rloc] = vlo2
    basesp = bases + pad
    # Each bucket reads TWO ADJACENT aligned window blocks of width WB
    # (BlockSpec index maps are in block-width units, so per-bucket
    # starts are WB-quantized; two consecutive blocks cover any band of
    # width <= WB regardless of alignment). Find the smallest WB.
    bmin = basesp.min(axis=1)
    bmax = basesp.max(axis=1) + WREL
    span = int((bmax - bmin).max())
    WB = -(-span // WBLK) * WBLK
    if WB > (MAX_WB // 2 if f64 else MAX_WB):
        return None        # band too wide for the VMEM window
    wblk = bmin // WB
    rel = (basesp - (wblk * WB)[:, None]) // 128   # in [0, 2*WB/128)
    assert int(rel.max()) * 128 + WREL <= 2 * WB
    scal = np.concatenate([wblk, rel.reshape(-1)]).astype(np.int32)
    return WindowedELL(scal=scal,
                       offs=offs.reshape(nrb, S, RT, 128),
                       vals=vals.reshape(nrb, S, RT, 128),
                       nrb=nrb, S=S, npad=npad, n=n, pad=pad, WB=WB,
                       vals_lo=(vals_lo.reshape(nrb, S, RT, 128)
                                if f64 else None))


def matmat(nrb, S, npad, n, pad, WB, scal, offs, vals, X):
    """Apply the packed operator to an [n, k] f32 block. Traceable —
    call inside jit (the solver's loop) or wrap in jax.jit."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = X.shape[1]
    # padded source length: a multiple of the window block width so every
    # window block index (incl. the +1 sibling) is in range
    next_ = -(-(pad + npad + 1024 + 2 * WB + WREL) // WB) * WB

    WL = WB // 128   # window width in 128-lane chunks

    def kernel(scal_ref, offs_ref, vals_ref, bufa, bufb, *out_refs):
        b = pl.program_id(0)
        acc = [jnp.zeros((RT, 128), jnp.float32) for _ in range(k)]
        for s in range(S):
            rel = scal_ref[nrb + b * S + s]
            ot = offs_ref[0, s]
            vv = vals_ref[0, s]
            hi = ot >> 7
            lo = ot & 127
            for j in range(k):
                g = jnp.zeros((RT, 128), jnp.float32)
                for cch in range(NCH):
                    # the chunk lives in window block A or B depending on
                    # the (dynamic) slot base: load both candidates,
                    # select (in-bounds clamped dynamic lane slices)
                    ia = jnp.minimum(rel + cch, WL - 1)
                    ib = jnp.clip(rel + cch - WL, 0, WL - 1)
                    ta = bufa[j, :, pl.ds(ia * 128, 128)]
                    tb = bufb[j, :, pl.ds(ib * 128, 128)]
                    tbl = jnp.where(rel + cch < WL, ta, tb)
                    gc = jnp.take_along_axis(tbl, lo, axis=1)
                    g = jnp.where(hi == cch, gc, g)
                acc[j] = acc[j] + vv * g
        for j in range(k):
            out_refs[j][:] = acc[j]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((1, S, RT, 128), lambda b, sc: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, RT, 128), lambda b, sc: (b, 0, 0, 0)),
            pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b])),
            pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b] + 1)),
        ],
        out_specs=[pl.BlockSpec((RT, 128), lambda b, sc: (b, 0))
                   for _ in range(k)],
    )
    interpret = jax.devices()[0].platform != "tpu"
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nrb * RT, 128), jnp.float32)
                   for _ in range(k)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    XT = jnp.zeros((k, next_ + 1024), jnp.float32
                   ).at[:, pad:pad + n].set(X.T.astype(jnp.float32))
    # static slices: jnp.roll here lowers to a pathological ~24 ms
    # relayout on this backend (measured)
    XS = jnp.stack([jax.lax.dynamic_slice_in_dim(XT, 128 * i, next_,
                                                 axis=1)
                    for i in range(RT)], axis=1)
    # x64 mode corrupts Mosaic lowering (measured: infinite recursion in
    # convert_element_type / remote-compile failure even for all-f32
    # kernels); the kernel is f32/i32-only, so trace it with x64 off
    with jax.enable_x64(False):
        outs = f(scal, offs, vals, XS, XS)
    return jnp.stack([o.reshape(npad) for o in outs], axis=1)[:n]


def matmat_ds(nrb, S, npad, n, pad, WB, scal, offs, vals, vals_lo, X):
    """Double-precision apply via f32x2 double-single arithmetic.

    Mosaic has no 64-bit vectors, so f64 runs as two f32 streams
    (``hi + lo`` value splitting) with error-free transformations inside
    the kernel: Dekker-split two-product for ``vals_hi * x_hi`` plus the
    first-order cross terms, and Knuth two-sum compensated accumulation
    over the slot loop. The accumulated (hi, lo) pair is recombined in
    f64 outside. Arithmetic error ~ O(eps_f32^2) ~ 1e-14 relative — the
    f64 golden/1e-10 paths' requirement — at roughly 2x the f32 kernel's
    gather traffic (two window buffers) and ~10x its (non-binding) flops.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = X.shape[1]
    next_ = -(-(pad + npad + 1024 + 2 * WB + WREL) // WB) * WB
    WL = WB // 128

    if jax.devices()[0].platform != "tpu":
        # Interpret-mode (XLA:CPU) FOLDS the error-free transformations
        # under a pallas grid (measured: identical result with
        # optimization_barrier around every EFT term — the compensation
        # collapses to f32; the same kernel on Mosaic/TPU is exact to
        # 5e-14). CPU has native f64, so the fallback just runs the
        # windowed gather in f64 directly — same data layout, full
        # precision, test-path only.
        rel = scal[nrb:].reshape(nrb, S)
        base = (scal[:nrb, None] * WB + rel * 128)          # [nrb, S]
        idx = (base[:, :, None, None]
               + (128 * jnp.arange(RT, dtype=jnp.int32))[None, None, :,
                                                         None]
               + offs)                                      # [nrb,S,RT,128]
        v64 = vals.astype(jnp.float64) + vals_lo.astype(jnp.float64)
        XT = jnp.zeros((k, next_ + 1024), jnp.float64
                       ).at[:, pad:pad + n].set(X.T.astype(jnp.float64))
        y = jnp.zeros((nrb, RT, 128, k), jnp.float64)
        for s in range(S):                   # static loop; S ~ dozens
            g = XT[:, idx[:, s]]             # [k, nrb, RT, 128]
            y = y + v64[:, s][:, :, :, None] * jnp.moveaxis(g, 0, -1)
        return y.reshape(npad, k)[:n]

    def kernel(scal_ref, offs_ref, vh_ref, vl_ref, bah, bbh, bal, bbl,
               *out_refs):
        b = pl.program_id(0)
        acch = [jnp.zeros((RT, 128), jnp.float32) for _ in range(k)]
        accl = [jnp.zeros((RT, 128), jnp.float32) for _ in range(k)]
        for s in range(S):
            rel = scal_ref[nrb + b * S + s]
            ot = offs_ref[0, s]
            vh = vh_ref[0, s]
            vl = vl_ref[0, s]
            hi = ot >> 7
            lo = ot & 127
            for j in range(k):
                gh = jnp.zeros((RT, 128), jnp.float32)
                gl = jnp.zeros((RT, 128), jnp.float32)
                for cch in range(NCH):
                    ia = jnp.minimum(rel + cch, WL - 1)
                    ib = jnp.clip(rel + cch - WL, 0, WL - 1)
                    sel = rel + cch < WL
                    th = jnp.where(sel, bah[j, :, pl.ds(ia * 128, 128)],
                                   bbh[j, :, pl.ds(ib * 128, 128)])
                    tl = jnp.where(sel, bal[j, :, pl.ds(ia * 128, 128)],
                                   bbl[j, :, pl.ds(ib * 128, 128)])
                    m = hi == cch
                    gh = jnp.where(m, jnp.take_along_axis(th, lo, axis=1),
                                   gh)
                    gl = jnp.where(m, jnp.take_along_axis(tl, lo, axis=1),
                                   gl)
                # two-product vh*gh (Dekker 12-12 split; exact in f32)
                p = vh * gh
                cs = vh * 4097.0
                vhh = cs - (cs - vh)
                vhl = vh - vhh
                cg = gh * 4097.0
                ghh = cg - (cg - gh)
                ghl = gh - ghh
                e = ((vhh * ghh - p) + vhh * ghl + vhl * ghh) + vhl * ghl
                # first-order cross terms (vl*gl ~ eps^2, below target)
                e = e + vh * gl + vl * gh
                # two-sum compensated accumulation (Knuth)
                s1 = acch[j] + p
                bb = s1 - acch[j]
                err = (acch[j] - (s1 - bb)) + (p - bb)
                acch[j] = s1
                accl[j] = accl[j] + (err + e)
        for j in range(k):
            out_refs[2 * j][:] = acch[j]
            out_refs[2 * j + 1][:] = accl[j]

    win_spec_h = pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b]))
    win_spec_h1 = pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b] + 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((1, S, RT, 128), lambda b, sc: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, RT, 128), lambda b, sc: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, RT, 128), lambda b, sc: (b, 0, 0, 0)),
            win_spec_h, win_spec_h1,
            pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b])),
            pl.BlockSpec((k, RT, WB), lambda b, sc: (0, 0, sc[b] + 1)),
        ],
        out_specs=[pl.BlockSpec((RT, 128), lambda b, sc: (b, 0))
                   for _ in range(2 * k)],
    )
    interpret = jax.devices()[0].platform != "tpu"
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nrb * RT, 128), jnp.float32)
                   for _ in range(2 * k)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    Xf = X.astype(jnp.float64)
    Xh = Xf.astype(jnp.float32)
    Xl = (Xf - Xh.astype(jnp.float64)).astype(jnp.float32)

    def expand(Xc):
        XT = jnp.zeros((k, next_ + 1024), jnp.float32
                       ).at[:, pad:pad + n].set(Xc.T)
        return jnp.stack(
            [jax.lax.dynamic_slice_in_dim(XT, 128 * i, next_, axis=1)
             for i in range(RT)], axis=1)

    XSh, XSl = expand(Xh), expand(Xl)
    # see matmat: Mosaic lowering breaks under x64 mode; the kernel is
    # f32/i32-only (the f64 combine happens outside, below)
    with jax.enable_x64(False):
        outs = f(scal, offs, vals, vals_lo, XSh, XSh, XSl, XSl)
    y = [outs[2 * j].astype(jnp.float64)
         + outs[2 * j + 1].astype(jnp.float64) for j in range(k)]
    return jnp.stack([o.reshape(npad) for o in y], axis=1)[:n]
