"""Lane-oriented spill machinery for the transposed (tband) layout.

The tband fast path (kernels/tband.py) carries activations as X^T
[dt, M].  Its round-3 spill wrapper relayouted BOTH operands to [M, dt]
and back to reuse the row-oriented merge — three full-array passes plus
sublane-penalized gathers, measured 4.9 ms at YS@1.0 (vs 2.7 ms for the
wide path's spill on the same graph; tools/profile_parts.py).  This
module keeps the entire spill population in the lane orientation:

  gathered = take(xt, gcols, axis=1)        # [dt, C*128]; ~1.9 ns/col
                                            # on tables under the wall
  buf      = tbstream_merge(...)            # block-wide one-hot merge,
                                            # lane twin of
                                            # kernels/dstream.bstream_merge

plus two aliased zero-fill kernels replacing the `.at[ids].set(0)`
missing-super pass (XLA lowers that scatter to a full-buffer copy —
757 us at YS, 1.6 ms at YH, tools/profile_parts.py), and ``mxgather``:
a slab-DMA + iota-one-hot MXU gather that builds a compact unique-column
table straight from the transposed layout when [dt, M] exceeds the
big-table gather wall (lane takes measured ~15 ns/col at 112 MB vs
~1.9 ns from compact tables; tools/probe_tspill.py).

Reference analog: the spill population implements the leftover-CSR half
of the hybrid format (hybrid_all_kernel.cu:964-1036 CSR part); the
one-hot-matmul merge and slab-DMA gather are TPU-native replacements
for its warp-level atomics and cached random loads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# aliased zero-fill: write zero blocks into an existing buffer
# ---------------------------------------------------------------------------


def _zero_kernel(ids_ref, prev_ref, out_ref):
    del ids_ref, prev_ref
    out_ref[...] = jnp.zeros_like(out_ref)


def zero_lane_blocks(buf, ids, bh: int):
    """buf [dt, M] with columns [ids[i]*bh, (ids[i]+1)*bh) zeroed.

    Aliased in-place kernel: unvisited blocks keep the input data, so
    the cost is one [dt, bh] write per id instead of the full-buffer
    copy XLA emits for ``.at[ids].set(0)``."""
    n = int(ids.shape[0])
    if n == 0:
        return buf
    dt, m = buf.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((dt, bh), lambda i, w_: (0, w_[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, bh), lambda i, w_: (0, w_[i]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _zero_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dt, m), buf.dtype),
        input_output_aliases={1: 0},
        interpret=_interpret(),
    )(ids, buf)


def zero_row_blocks(buf, ids, bh: int):
    """buf [M, dp] with rows [ids[i]*bh, (ids[i]+1)*bh) zeroed (the wide
    layout's twin of zero_lane_blocks)."""
    n = int(ids.shape[0])
    if n == 0:
        return buf
    m, dp = buf.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((bh, dp), lambda i, w_: (w_[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, dp), lambda i, w_: (w_[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _zero_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, dp), buf.dtype),
        input_output_aliases={1: 0},
        interpret=_interpret(),
    )(ids, buf)


# ---------------------------------------------------------------------------
# tbstream: block-wide one-hot merge in the lane orientation
# ---------------------------------------------------------------------------


def _tbstream_kernel(blk_ref, local_ref, gath_ref, prev_ref, out_ref,
                     acc_ref, *, span, bw, out_dtype, precision):
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    first = jnp.logical_or(s == 0,
                           blk_ref[s] != blk_ref[jnp.maximum(s - 1, 0)])
    last = jnp.logical_or(s == ns - 1,
                          blk_ref[s] != blk_ref[jnp.minimum(s + 1, ns - 1)])

    @pl.when(first)
    def _():
        acc_ref[...] = prev_ref[...].astype(jnp.float32)

    # local ids arrive as an 8-chunk [8, bw] LANE-vector block; row s%8
    # is this chunk's, selected by a masked sum (Mosaic rejects dynamic
    # unaligned sublane loads).  The round-1..4 [C, bw, 1] sublane-
    # vector layout tiled to T(8,128) with lane dim 1 -> a 128x memory
    # blow-up (10.9 GB at DP@0.25) and a padded-tile DMA per chunk that
    # carried most of the measured ~400 ns/chunk fixed cost.
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, bw), 0) == s % 8)
    lg = jnp.sum(jnp.where(rowmask, local_ref[...], 0), axis=0,
                 keepdims=True)                            # [1, bw]
    sub = jax.lax.broadcasted_iota(jnp.int32, (span, bw), 0)
    oh = (sub == lg).astype(gath_ref.dtype)                # [span, bw]
    acc_ref[...] += jax.lax.dot_general(
        gath_ref[...], oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def tbstream_merge(gathered, local_t, blk, buf, *, group: int):
    """``buf + scatter-add of gathered columns by destination lane``.

    gathered: [dt, C*bw] — chunk c's ``bw`` edge columns (already
    gathered from the activation/compact table; bw = 128*batch, round-5
    chunk batching amortizes the per-grid-step fixed cost); local_t:
    int32 [ceil(C/8)*8, bw] — each slot's destination lane within its
    ``group*128``-lane block (sentinel group*128 drops; row c = chunk c,
    8-row sublane padding as build_bstream emits); blk: int32 [C]
    nondecreasing destination block ids; buf: [dt, M].  Lane twin of
    dstream.bstream_merge — same chunking host meta (build_bstream with
    chunk_edges=bw), same revisit-accumulate scratch pattern, one
    one-hot dot per chunk on the MXU (rhs-transposed form; the one-hot
    builds [span, bw] against the selected lane-vector row)."""
    dt, m = buf.shape
    span = group * 128
    assert m % span == 0, (m, group)
    bw = local_t.shape[1]
    c = gathered.shape[1] // bw
    assert local_t.shape == (-(-c // 8) * 8, bw), (local_t.shape, c, bw)
    precision = (jax.lax.Precision.HIGHEST
                 if gathered.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                             # blk
        grid=(c,),
        in_specs=[
            pl.BlockSpec((8, bw), lambda i, b_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dt, bw), lambda i, b_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dt, span), lambda i, b_: (0, b_[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dt, span), lambda i, b_: (0, b_[i]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((dt, span), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_tbstream_kernel, span=span, bw=bw,
                          out_dtype=buf.dtype, precision=precision),
        grid_spec=grid_spec,
        # flattened input index: blk(0), local(1), gathered(2), prev(3)
        input_output_aliases={3: 0},
        out_shape=jax.ShapeDtypeStruct((dt, m), buf.dtype),
        interpret=_interpret(),
    )(blk, local_t, gathered, buf)


def segmented_gather(t1, ranks, laneg, segs, pieces, bw: int):
    """Per-edge spill gather through destination-segment tables (the
    round-5 gather-wall fix; plan.ts2_segs / format.plan
    _build_ts2_segments).

    t1: [dt, T1w] compact col-major table (mxgather output); ranks:
    int32 [U2] piece-relative T1 slots in PIECE-MAJOR order; laneg:
    int32 [C*bw] segment-relative per-slot positions; segs/pieces:
    static meta.  Returns gathered [dt, C*bw] in merge-chunk order.

    Two measured facts shape this (tools/probe_loctake.py /
    probe_workset.py, artifacts/probe_loctake_r5.log): (1) lane gathers
    run ~2.2 ns/idx only from tables that fit the ~16-24 MB gather
    cache (6.1 at 32 MB, 13.3 from 48 MB up), with access locality
    contributing NOTHING; (2) the cache warms only via gather misses at
    ~68 us/MB, so each table cycled through it is paid once per pass.
    Hence: the build runs PIECE-MAJOR (one take per sub-wall T1 piece —
    T1 cycles the cache exactly once), segment tables reassemble from
    static slices of the piece results (pure copies at stream
    bandwidth), and the per-edge takes hit each sub-wall segment table
    over one contiguous stretch of chunks (one warm per segment)."""
    piece_res = []
    for (p_lo, p_w, r0, cnt) in pieces:
        piece = jax.lax.slice_in_dim(t1, p_lo, p_lo + p_w, axis=1)
        piece_res.append(jnp.take(piece, ranks[r0:r0 + cnt], axis=1,
                                  mode="clip"))
    parts = []
    for s in segs:
        tparts = [jax.lax.slice_in_dim(piece_res[pi], off, off + cnt,
                                       axis=1)
                  for (pi, off, cnt) in s["parts"] if cnt]
        seg_tbl = (tparts[0] if len(tparts) == 1
                   else jnp.concatenate(tparts, axis=1))
        sl = laneg[s["chunk_lo"] * bw: s["chunk_hi"] * bw]
        parts.append(jnp.take(seg_tbl, sl, axis=1, mode="clip"))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# mxgather: compact-table build from the transposed layout
# ---------------------------------------------------------------------------

_MX_SLOTS = 4  # DMA pipeline slots, as kernels/block_spmm.py


def build_mx_chunks(ucols: np.ndarray, span: int, k: int, m: int):
    """Greedy chunking of SORTED unique cols for mxgather: each chunk
    covers <= k cols whose lanes fit in a ``span`` window from a
    128-aligned slab base.  Returns (lo [C] int32 slab bases,
    rel [C, 1, k] int32 in-slab offsets (-1 pad -> zero rows),
    slot [U] int32 — each col's row in the compact [C*k, ...] table)."""
    ucols = np.asarray(ucols, dtype=np.int64)
    u = len(ucols)
    if u == 0:
        return (np.zeros(0, np.int32), np.zeros((0, 1, k), np.int32),
                np.zeros(0, np.int32))
    assert m >= span and m % 128 == 0, (m, span)  # padded lane spaces only
    los, rels = [], []
    slot = np.empty(u, dtype=np.int32)
    hi_base = ((m - span) // 128) * 128  # keep slabs 128-aligned AND in-bounds
    i = 0
    while i < u:
        base = min((int(ucols[i]) // 128) * 128, hi_base)
        j = min(i + k, int(np.searchsorted(ucols, base + span)))
        r = np.full(k, -1, dtype=np.int32)
        r[: j - i] = ucols[i:j] - base
        slot[i:j] = len(los) * k + np.arange(j - i)
        los.append(base)
        rels.append(r)
        i = j
    return (np.asarray(los, dtype=np.int32),
            np.stack(rels)[:, None, :].astype(np.int32), slot)


_MX_NB = 4  # chunks per grid step (round 5): the ~400 ns per-grid-step
#   fixed cost was the T1/hub build wall on span-limited populations
#   (YH ~1.25 ms for 166k unique cols); batching NB slab DMAs + one-hot
#   dots per step divides it


def mxgather_lanes(xt, lo, rel, *, span: int):
    """Compact table [dt, C*k]: column c*k+j = xt[:, lo[c]+rel[c,j]]
    (zeros where rel = -1).  Deep-pipelined slab DMA + iota one-hot MXU
    dot, ``_MX_NB`` chunks per grid step — turns the unsorted big-table
    gather (~15 ns/col at 112 MB) into streaming slab reads + matmuls,
    and the compact result then serves every per-edge gather at the
    small-table rate."""
    c = lo.shape[0]
    k = rel.shape[2]
    dt, m = xt.shape
    L = _MX_SLOTS
    NB = _MX_NB
    # pad chunk count to a multiple of NB (repeat-last slab; all-pad rel
    # rows emit zero columns into trailing output slots nothing indexes)
    cp = -(-c // NB) * NB
    if cp != c:
        lo = jnp.concatenate([lo, jnp.broadcast_to(lo[-1:], (cp - c,))])
        rel = jnp.concatenate(
            [rel, jnp.full((cp - c, 1, k), -1, rel.dtype)])
    steps = cp // NB

    def kern(lo_ref, rel_ref, x_hbm, out_ref, slabs, sems):
        i = pl.program_id(0)
        s = pl.num_programs(0)
        la = L - 1

        def dma(j, b, slot):
            base = pl.multiple_of(lo_ref[j * NB + b], 128)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(base, span)], slabs.at[slot, b],
                sems.at[slot, b])

        @pl.when(i == 0)
        def _():
            for j in range(la):
                @pl.when(j < s)
                def _():
                    for b in range(NB):
                        dma(j, b, j).start()

        @pl.when(i + la < s)
        def _():
            for b in range(NB):
                dma(i + la, b, (i + la) % L).start()

        iota = jax.lax.broadcasted_iota(jnp.int32, (span, k), 0)
        for b in range(NB):
            dma(i, b, i % L).wait()
            oh = (iota == rel_ref[b, 0][None, :]).astype(xt.dtype)
            out_ref[:, b * k:(b + 1) * k] = jnp.dot(
                slabs[i % L, b], oh,
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((NB, 1, k), lambda i, lo_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((dt, NB * k), lambda i, lo_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, NB, dt, span), xt.dtype),
            pltpu.SemaphoreType.DMA((L, NB)),
        ],
    )
    # returned width is ceil(C/NB)*NB*k — trailing pad slots are exact
    # zeros nothing indexes (slicing them off would cost a relayout copy)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dt, cp * k), xt.dtype),
        interpret=_interpret(),
    )(lo, rel, xt)
