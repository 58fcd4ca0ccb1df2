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


def dstream_merge(gcols, local, blk, lt, xsrc, out, *, group: int):
    """``out + scatter-add of xsrc[gcols] by destination`` with the merge
    running as the streamed Pallas kernel.  ``out`` rows must be a
    multiple of group*128 and every blk must index inside it; ``out`` is
    donated (aliased) — untouched destination blocks keep its contents.
    """
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
    full padded row space (callers that slice to [n] fall back to take)."""
    return dstream_merge(arrs["ds_gcols"], arrs["ds_local"], arrs["ds_blk"],
                         arrs["ds_lt"], xsrc, out, group=plan.ds_group)
