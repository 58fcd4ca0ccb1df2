"""Dst-streamed spill merge: Pallas sorted segment-sum into the padded output.

Round-2 hardware probes (artifacts/round2_hw.jsonl, tools/probe_gather.py)
killed the round-1 premise that the spill population's wall is the X
gather: XLA take runs at 3.9 ns/row (f32) while the XLA MERGE —
``segment_sum`` (7.5 ns/row) + ``.at[].add`` scatter (13.7 ns/row) — is
~80% of the measured ~16 ns/edge spill cost on power-law graphs.  This
module replaces the merge with a streaming Pallas kernel:

  1. Host sorts spill edges by DESTINATION row (CSR order already is) and
     chunks them 128-at-a-time such that no chunk straddles a 128-row
     destination tile; chunks are grouped G-per-step such that no step
     straddles a G*128-row destination block.
  2. XLA ``take`` gathers the edges' X rows in that order (the one part
     XLA already does at speed).
  3. The kernel streams the gathered rows; each chunk collapses onto its
     destination tile with ONE one-hot MXU dot (exact: one operand is
     0/1, f32 accumulation), accumulated in a VMEM f32 block scratch.
     The output block is index-mapped by a prefetched chunk->block table
     (consecutive revisits stay VMEM-resident, the gmm/megablox grouped-
     matmul pattern) and is input/output-aliased with the band kernel's
     output, so destination blocks with no spill keep the band result
     without any full-array pass.

Per-edge cost: take ~4-6 ns + streamed merge ~1-2 ns, vs ~16 ns for the
XLA formulation — the merge leaves the critical path.  Reference
behaviour match: the CUDA-core CSR accumulate (hybrid_all_kernel.cu:
971-1036) over the rows the window formats don't carry; unweighted
binary adjacency.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hcspmm_tpu.kernels.block_spmm import _interpret

_SENTINEL = 128  # local-dst sentinel: matches no lane -> zero one-hot row


def pick_group(padded_rows: int, max_group: int = 8) -> int:
    """Largest G in {max_group..1} with padded_rows % (G*128) == 0.

    G chunks are merged per grid step into one G*128-row destination
    block; bigger G amortizes the ~0.2-0.3 us grid-step floor over more
    DMA bytes.  band_h=256 guarantees G >= 2."""
    g = max_group
    while g > 1 and padded_rows % (g * 128):
        g //= 2
    return max(g, 1)


def build_dstream(rows: np.ndarray, cols: np.ndarray, padded_rows: int,
                  pad_col: int, group: int = 0
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                             int]:
    """Chunk dst-sorted spill edges for the streamed merge.

    rows: int [E] destination rows (must be nondecreasing; CSR edge
    order is), all < padded_rows.  cols: int [E] X-row per edge.
    Returns (gcols [C*128] int32 — take indices, pad ``pad_col``;
    local [ceil(S/8)*8, G*128] int32 — dst row within its 128-row tile
    (row s holds step s's G chunks; 8-row sublane padding for the VMEM
    block, pad value 128);
    blk [S] int32 — destination block per step (S = C/G);
    lt [C] int32 — chunk's tile within its block; group).
    """
    if not group:
        group = pick_group(padded_rows)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    e = len(rows)
    if e:
        assert rows.max() < padded_rows, (rows.max(), padded_rows)
        tile = rows >> 7
        # chunk boundaries: every tile change, every 128 edges within one
        new_t = np.empty(e, dtype=bool)
        new_t[0] = True
        np.not_equal(tile[1:], tile[:-1], out=new_t[1:])
        tseg = np.cumsum(new_t) - 1
        tstart = np.zeros(tseg[-1] + 1, dtype=np.int64)
        tstart[tseg[new_t]] = np.where(new_t)[0]
        within = np.arange(e) - tstart[tseg]
        newc = new_t | ((within & 127) == 0)
        chunk_of = np.cumsum(newc) - 1                     # [E]
        nchunks = int(chunk_of[-1]) + 1
        slot = np.empty(e, dtype=np.int64)
        cstart = np.zeros(nchunks, dtype=np.int64)
        cstart[chunk_of[newc]] = np.where(newc)[0]
        slot = np.arange(e) - cstart[chunk_of]
        chunk_tile = tile[newc]                            # [C_real]
        chunk_blk = chunk_tile // group                    # [C_real]
        # group chunks G-per-step inside each destination block: pad each
        # block's chunk count to a multiple of G with no-op chunks
        ub, inv = np.unique(chunk_blk, return_inverse=True)
        nb = np.bincount(inv)
        mb = -(-nb // group) * group
        off = np.concatenate([[0], np.cumsum(mb)[:-1]])
        first_chunk = np.zeros(len(ub), dtype=np.int64)
        newb = np.empty(nchunks, dtype=bool)
        newb[0] = True
        np.not_equal(inv[1:], inv[:-1], out=newb[1:])
        first_chunk[inv[newb]] = np.where(newb)[0]
        chunk_pos = off[inv] + (np.arange(nchunks) - first_chunk[inv])
        c_cap = int(mb.sum())
        gcols = np.full(c_cap * 128, pad_col, dtype=np.int32)
        local = np.full((c_cap, 128), _SENTINEL, dtype=np.int32)
        lt = np.zeros(c_cap, dtype=np.int32)
        pos_e = chunk_pos[chunk_of]
        gcols[pos_e * 128 + slot] = cols.astype(np.int32)
        local[pos_e, slot] = (rows & 127).astype(np.int32)
        # pad slots re-fetch their chunk's FIRST row instead of a fixed
        # far-away pad row: the padding gathers are real HBM reads
        # (24-36% of the gather stream on low-fill graphs) and a repeat
        # of an already-open page is far cheaper than a cold row.  The
        # sentinel local row zeroes their one-hot contribution either
        # way, so any index is correct.  Chunks with no real edge (the
        # per-block group padding) keep pad_col.
        gv = gcols.reshape(c_cap, 128)
        csz = np.bincount(pos_e, minlength=c_cap)
        padm = np.arange(128)[None, :] >= csz[:, None]
        gv[:] = np.where(padm, gv[:, :1], gv)
        lt[chunk_pos] = (chunk_tile % group).astype(np.int32)
        # padding chunks inside a block keep lt=0 (their one-hot is zero)
        blk = np.repeat(ub, mb // group).astype(np.int32)
        s_steps = c_cap // group
        s_pad = -(-s_steps // 8) * 8
        local2 = np.full((s_pad, group * 128), _SENTINEL, dtype=np.int32)
        local2[:s_steps] = local.reshape(s_steps, group * 128)
        local = local2
    else:
        c_cap = group
        gcols = np.full(c_cap * 128, pad_col, dtype=np.int32)
        local = np.full((8, group * 128), _SENTINEL, dtype=np.int32)
        lt = np.zeros(c_cap, dtype=np.int32)
        blk = np.zeros(1, dtype=np.int32)
    return gcols, local, blk, lt, group


def build_bstream(rows: np.ndarray, cols: np.ndarray, padded_rows: int,
                  pad_col: int, group: int = 0, chunk_edges: int = 128
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """BLOCK-wide chunking for the streamed merge (round-3 low-density
    fix).  ``build_dstream``'s chunks are destination-TILE-pure, so at
    low edges-per-tile the gather stream inflates ~1/fill with padding
    rows (measured 2.2x on the RD stand-in at 59 edges/tile,
    artifacts/round3_hw.jsonl).  Here a chunk only breaks at G*128-row
    destination BLOCK boundaries — fill recovers (each block pads at
    most one partial chunk) and the kernel routes each chunk with ONE
    taller one-hot dot [G*128, 128] instead of G tile dots.  The extra
    MXU work is idle capacity in this regime (the spill population is
    gather-bound).

    ``chunk_edges`` (round 5, 128-multiple): edges per chunk.  Wider
    chunks amortize the ~400 ns per-grid-step fixed cost of the merge
    kernel over more edges (RD's 24k 128-edge chunks carried ~11.6 ms
    of pure step overhead); the lane merge (kernels/tspill.py
    tbstream_merge) consumes any width.  The row-path kernels
    (_bstream_kernel) remain 128-edge only — callers of those keep the
    default.

    Returns (gcols [C*chunk_edges] int32 take indices (pad ``pad_col``);
    local [ceil(C/8)*8, chunk_edges] int32 — dst row within its
    G*128-row block, sentinel G*128; blk [C] int32 — destination block
    per chunk, nondecreasing; group).  One grid step per chunk.
    """
    if not group:
        group = pick_group(padded_rows)
    bw = int(chunk_edges)
    assert bw % 128 == 0 and bw > 0, bw
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    e = len(rows)
    span = group * 128
    sent = span
    if e:
        assert rows.max() < padded_rows, (rows.max(), padded_rows)
        blko = rows // span
        new_b = np.empty(e, dtype=bool)
        new_b[0] = True
        np.not_equal(blko[1:], blko[:-1], out=new_b[1:])
        bseg = np.cumsum(new_b) - 1
        bstart = np.zeros(bseg[-1] + 1, dtype=np.int64)
        bstart[bseg[new_b]] = np.where(new_b)[0]
        within = np.arange(e) - bstart[bseg]
        newc = new_b | (within % bw == 0)
        chunk_of = np.cumsum(newc) - 1
        c = int(chunk_of[-1]) + 1
        cstart = np.zeros(c, dtype=np.int64)
        cstart[chunk_of[newc]] = np.where(newc)[0]
        slot = np.arange(e) - cstart[chunk_of]
        gcols = np.full(c * bw, pad_col, dtype=np.int32)
        lpad = -(-c // 8) * 8
        local = np.full((lpad, bw), sent, dtype=np.int32)
        gcols[chunk_of * bw + slot] = cols.astype(np.int32)
        local[chunk_of, slot] = (rows % span).astype(np.int32)
        blk = blko[newc].astype(np.int32)
        # pad slots re-fetch the chunk's first row (see build_dstream):
        # repeat-page gathers are much cheaper than a cold pad row, and
        # the sentinel local zeroes their contribution regardless
        gv = gcols.reshape(c, bw)
        csz = np.bincount(chunk_of, minlength=c)
        padm = np.arange(bw)[None, :] >= csz[:, None]
        gv[:] = np.where(padm, gv[:, :1], gv)
    else:
        c = 1
        gcols = np.full(c * bw, pad_col, dtype=np.int32)
        local = np.full((8, bw), sent, dtype=np.int32)
        blk = np.zeros(1, dtype=np.int32)
    return gcols, local, blk, group


def _bstream_kernel(blk_ref, local_ref, gath_ref, prev_ref, out_ref,
                    acc_ref, *, group, out_dtype, precision):
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    first = jnp.logical_or(s == 0, blk_ref[s] != blk_ref[jnp.maximum(s - 1, 0)])
    last = jnp.logical_or(s == ns - 1,
                          blk_ref[s] != blk_ref[jnp.minimum(s + 1, ns - 1)])

    @pl.when(first)
    def _():
        acc_ref[...] = prev_ref[...].astype(jnp.float32)

    span = group * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (span, 128), 0)
    # local arrives as an 8-chunk [8, 128] VMEM block; row s%8 is this
    # chunk's, selected by a masked sum (Mosaic rejects dynamic
    # unaligned sublane loads)
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == s % 8)
    lg = jnp.sum(jnp.where(rowmask, local_ref[...], 0), axis=0,
                 keepdims=True)
    onehot = (lane == lg).astype(gath_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        onehot, gath_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def bstream_merge(gcols, local, blk, xsrc, out, *, group: int,
                  gather_f32: bool = False):
    """``out + scatter-add of xsrc[gcols] by destination``, block-wide
    chunks (build_bstream).  Same contract as dstream_merge."""
    if gather_f32 and xsrc.dtype != jnp.float32:
        xsrc = xsrc.astype(jnp.float32)
    m, dp = out.shape
    assert m % (group * 128) == 0, (m, group)
    c = gcols.shape[0] // 128
    assert local.shape == (-(-c // 8) * 8, 128), (local.shape, c)
    gathered = jnp.take(xsrc, gcols, axis=0, mode="clip")
    assert gathered.shape[1] == dp, (gathered.shape, dp)
    precision = (jax.lax.Precision.HIGHEST
                 if gathered.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                             # blk
        grid=(c,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, b_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, dp), lambda i, b_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 128, dp), lambda i, b_: (b_[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group * 128, dp), lambda i, b_: (b_[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((group * 128, dp), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bstream_kernel, group=group, out_dtype=out.dtype,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, dp), out.dtype),
        input_output_aliases={3: 0},
        interpret=_interpret(),
    )(blk, local, gathered, out)


def build_dstream_ranges(rows: np.ndarray, cols: np.ndarray,
                         padded_rows: int, pad_col: int,
                         num_ranges: int, range_rows: int,
                         group: int = 0):
    """Column-range-blocked dstream layout (round-3 spill gather fix).

    Hardware motivation (artifacts/round3_hw.jsonl take_vs_table probe,
    v5e): XLA's random row gather rate degrades with the SOURCE TABLE
    footprint — 3.9 ns/row from a 102 MB table vs 8.6 ns/row from
    1.23 GB (and ~19 ns/row measured end-to-end on the RD stand-in's
    ~0.5 GB activation) — a page-locality latency wall, not bandwidth.
    Splitting the spill edges by COLUMN range and gathering each range
    from a materialized contiguous slice of X restores the small-table
    rate; the merges chain through the same aliased output (dstream is
    additive), so correctness is unchanged.  Reference analog: the
    CUDA-core path's L2 captures exactly this locality on GPU
    (hybrid_all_kernel.cu:964-1036, report §IV-B).

    Edges must arrive dst-sorted (CSR order); the stable column-range
    partition preserves that within each range.  Range p gathers from
    ``x[r0_p : r0_p + range_rows]`` with ``r0_p = min(p*range_rows,
    padded_rows - range_rows)`` (the last range rebases against the
    clamped start).  Returns (gcols, local, blk, lt, group, meta) with
    the per-range arrays concatenated and ``meta`` holding the static
    slice table: dict(r0 [P], steps [P+1], chunks [P+1], lrows [P+1],
    range_rows).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if not group:
        group = pick_group(padded_rows)
    r0s, g_l, l_l, b_l, t_l = [], [], [], [], []
    steps = [0]
    chunks = [0]
    lrows = [0]
    for p in range(num_ranges):
        r0 = min(p * range_rows, max(padded_rows - range_rows, 0))
        c0, c1 = p * range_rows, (p + 1) * range_rows
        if p == num_ranges - 1:
            c1 = max(c1, padded_rows, int(cols.max()) + 1 if len(cols)
                     else 0)
        m = (cols >= c0) & (cols < c1)
        r0s.append(r0)
        if not m.any():
            steps.append(steps[-1])
            chunks.append(chunks[-1])
            lrows.append(lrows[-1])
            continue
        # rebase against the clamped slice start; pad_col -> range_rows
        # (clip mode keeps it in the slice, sentinel local zeroes it)
        g, l, b, t, _ = build_dstream(rows[m], cols[m] - r0, padded_rows,
                                      pad_col=range_rows, group=group)
        g_l.append(g)
        l_l.append(l)
        b_l.append(b)
        t_l.append(t)
        steps.append(steps[-1] + len(b))
        chunks.append(chunks[-1] + len(t))
        lrows.append(lrows[-1] + l.shape[0])
    if not g_l:  # no spill edges at all (callers normally gate on this)
        g, l, b, t, _ = build_dstream(rows[:0], cols[:0], padded_rows,
                                      pad_col=range_rows, group=group)
        g_l, l_l, b_l, t_l = [g], [l], [b], [t]
        steps = [0, len(b)]
        chunks = [0, len(t)]
        lrows = [0, l.shape[0]]
        r0s = [0] * max(num_ranges, 1)
    meta = dict(r0=np.asarray(r0s, dtype=np.int64),
                steps=np.asarray(steps, dtype=np.int64),
                chunks=np.asarray(chunks, dtype=np.int64),
                lrows=np.asarray(lrows, dtype=np.int64),
                range_rows=int(range_rows))
    return (np.concatenate(g_l), np.concatenate(l_l, axis=0),
            np.concatenate(b_l), np.concatenate(t_l), group, meta)


def _dstream_kernel(blk_ref, lt_ref, local_ref, gath_ref, prev_ref, out_ref,
                    acc_ref, *, group, out_dtype, precision):
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    first = jnp.logical_or(s == 0, blk_ref[s] != blk_ref[jnp.maximum(s - 1, 0)])
    last = jnp.logical_or(s == ns - 1,
                          blk_ref[s] != blk_ref[jnp.minimum(s + 1, ns - 1)])

    @pl.when(first)
    def _():
        acc_ref[...] = prev_ref[...].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    for g in range(group):
        # onehot[j, e] = (j == local[e]) (the row-vector broadcasts along
        # sublanes); contraction over the EDGE dim (lhs dim 1):
        # part[j, :] = sum_e onehot[j, e] * gath[e, :].  Exact: 0/1 times
        # bf16/f32 values, f32 accumulation.  local arrives as an 8-step
        # [8, G*128] block; row s%8 is this step's, selected by a masked
        # sum (Mosaic rejects dynamic unaligned sublane loads)
        l8 = local_ref[:, pl.ds(g * 128, 128)]             # [8, 128]
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                   == s % 8)
        lg = jnp.sum(jnp.where(rowmask, l8, 0), axis=0, keepdims=True)
        onehot = (lane == lg).astype(gath_ref.dtype)
        part = jax.lax.dot_general(
            onehot, gath_ref[pl.ds(g * 128, 128), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        off = pl.multiple_of(lt_ref[s * group + g] * 128, 128)
        acc_ref[pl.ds(off, 128), :] += part

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def dstream_merge(gcols, local, blk, lt, xsrc, out, *, group: int,
                  gather_f32: bool = False):
    """``out + scatter-add of xsrc[gcols] by destination`` with the merge
    running as the streamed Pallas kernel.  ``out`` rows must be a
    multiple of group*128 and every blk must index inside it; ``out`` is
    donated (aliased) — untouched destination blocks keep its contents.

    ``gather_f32``: cast a bf16 source to f32 BEFORE the gather.  The
    probe (artifacts/round3_hw.jsonl take_parallel) measured bf16 row
    gathers 45% slower than f32 (sub-word relayout, 5.8 vs 4.0 ns/row);
    on large spill populations the one-time cast stream costs less than
    the per-row penalty, and the f32 path also makes the one-hot merge
    exact (HIGHEST precision).
    """
    if gather_f32 and xsrc.dtype != jnp.float32:
        xsrc = xsrc.astype(jnp.float32)
    m, dp = out.shape
    assert m % (group * 128) == 0, (m, group)
    c = gcols.shape[0] // 128
    s = c // group
    assert local.shape == (-(-s // 8) * 8, group * 128), (local.shape, s)
    # mode='clip': padding slots carry pad_col which may equal len(xsrc)
    # (plans where padded_rows == num_nodes); the default fill mode would
    # gather NaN there and poison the one-hot dot (0 * NaN = NaN).  The
    # sentinel local id already zeroes padding contributions, so any
    # finite row is safe — clip is also the cheapest gather mode.
    gathered = jnp.take(xsrc, gcols, axis=0, mode="clip")  # [C*128, dp']
    assert gathered.shape[1] == dp, (gathered.shape, dp)
    # the one-hot operand is exactly 0/1, so HIGHEST (bf16x3 passes) makes
    # the f32 merge exact; default precision would truncate the gathered
    # values to bf16 (measured 1.6e-3 rel err vs take's 1e-6)
    precision = (jax.lax.Precision.HIGHEST
                 if gathered.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                             # blk, lt
        grid=(s,),
        in_specs=[
            pl.BlockSpec((8, group * 128), lambda i, b_, l_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 128, dp), lambda i, b_, l_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 128, dp), lambda i, b_, l_: (b_[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group * 128, dp), lambda i, b_, l_: (b_[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((group * 128, dp), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dstream_kernel, group=group, out_dtype=out.dtype,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, dp), out.dtype),
        # flattened input index: blk(0), lt(1), local(2), gathered(3),
        # prev-out(4) -> output 0 (the gmm existing-out pattern)
        input_output_aliases={4: 0},
        interpret=_interpret(),
    )(blk, lt, local, gathered, out)


def dstream_spill(arrs, xsrc, out, plan):
    """apply_spill dispatch target: requires plan.ds_group and out in the
    full padded row space (callers that slice to [n] fall back to take).

    Column-range-blocked plans (plan.ds_meta, build_dstream_ranges) loop
    the ranges: each materializes a contiguous X slice (sequential copy)
    and merges through the aliased output — the take gathers run against
    small tables at the fast page-local rate."""
    gf32 = bool(getattr(plan, "ds_gather_f32", False))
    if "ds_ucols" in arrs:
        # two-level gather (plan.ds_ucols): ONE sorted take builds the
        # compact unique-column table; every chunk gather below —
        # including the padding slots — then hits a small table at the
        # fast page-local rate instead of the full activation space
        xsrc = jnp.take(xsrc, arrs["ds_ucols"], axis=0, mode="clip")
    if getattr(plan, "ds_kind", "tile") == "block":
        return bstream_merge(arrs["ds_gcols"], arrs["ds_local"],
                             arrs["ds_blk"], xsrc, out,
                             group=plan.ds_group, gather_f32=gf32)
    meta = getattr(plan, "ds_meta", None)
    if meta is None:
        return dstream_merge(arrs["ds_gcols"], arrs["ds_local"],
                             arrs["ds_blk"], arrs["ds_lt"], xsrc, out,
                             group=plan.ds_group, gather_f32=gf32)
    rr = int(meta["range_rows"])
    g = plan.ds_group
    steps, chunks, lrows, r0 = (meta["steps"], meta["chunks"],
                                meta["lrows"], meta["r0"])
    for p in range(len(r0)):
        if p >= len(steps) - 1 or steps[p + 1] == steps[p]:
            continue  # empty range: no slice, no kernel
        xs = jax.lax.dynamic_slice(
            xsrc, (int(r0[p]), 0), (rr, xsrc.shape[1]))
        out = dstream_merge(
            arrs["ds_gcols"][int(chunks[p]) * 128:int(chunks[p + 1]) * 128],
            arrs["ds_local"][int(lrows[p]):int(lrows[p + 1])],
            arrs["ds_blk"][int(steps[p]):int(steps[p + 1])],
            arrs["ds_lt"][int(chunks[p]):int(chunks[p + 1])],
            xs, out, group=g)
    return out
