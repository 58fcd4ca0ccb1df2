"""Column-streamed MXU gather for the spill population.

The spill population's production formulation gathers ``X[col]`` per edge
with ``jnp.take`` — random HBM rows at the measured ~27 GB/s take wall
(memory-bound at ~19 ns/edge for dp=128 f32), which dominates power-law
graphs where 10-70% of edges spill (docs/ROADMAP.md).  This module is the
streaming alternative:

  1. Host sorts the spill edges by COLUMN and groups them into chunks of
     <=128 edges that share one 128-row tile of X.
  2. The kernel streams each chunk's X tile ``[128, dp]`` into VMEM with a
     double-buffered multi-chunk ring (a 32 KB contiguous DMA instead of
     128 row gathers) and *selects* the chunk's rows on the MXU:
     ``onehot[e, j] = (col_local[e] == j)``, ``G_chunk = onehot @ Xtile``.
     Per edge that is ~256 B of streamed DMA + 128*dp MACs + 128*dp
     one-hot compares — ~1 ns/edge against take's ~19.

The output is the gathered rows in column-sorted edge order; the merge
(scatter-add by destination row) stays on the XLA side — ``tools/ab_spill``
measures formulation A/Bs on hardware.

TPU-design rationale: the reference GPU's CUDA-core path leans on the L2
cache for exactly this scattered-column reuse (report §IV-B: X loading is
>60% of TC-path time); TPUs have no data cache, so the locality must be
*constructed* — column-sorting makes every X byte in a tile useful to all
edges of the chunk, and the MXU does the row selection for free relative
to HBM bandwidth.  Reference behaviour match: the CSR gather-accumulate of
``hybrid_all_kernel.cu:971-1036`` (unweighted binary adjacency).
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

_SENTINEL_COL = 128  # never equals a lane id -> one-hot row of zeros
_PAD_ROW = np.iinfo(np.int32).max  # scatter mode='drop' discards


def build_colstream(cols: np.ndarray, rows: np.ndarray,
                    group: int = 8) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """Chunk spill edges for the column-streamed gather.

    cols/rows: int arrays [E] (destination row per edge; cols index X).
    Returns (tile_base [C] int32 (128-aligned X row base per chunk),
    cols_local [C, 128] int32 in [0, 128) with 128 padding,
    rows_flat [C*128] int32 with INT32_MAX padding) where C is padded to
    a multiple of ``group``.
    """
    cols = np.asarray(cols, dtype=np.int64)
    rows = np.asarray(rows, dtype=np.int64)
    order = np.argsort(cols, kind="stable")
    cols_s = cols[order]
    rows_s = rows[order]
    tile = cols_s >> 7
    # chunk boundaries: every tile change, and every 128 edges within one
    # tile (both computed vectorized)
    e = len(cols_s)
    if e:
        new_tile = np.empty(e, dtype=bool)
        new_tile[0] = True
        np.not_equal(tile[1:], tile[:-1], out=new_tile[1:])
        tile_seg = np.cumsum(new_tile) - 1
        seg_start = np.zeros(tile_seg[-1] + 1, dtype=np.int64)
        first = np.where(new_tile)[0]
        seg_start[tile_seg[new_tile]] = first
        within = np.arange(e) - seg_start[tile_seg]
        chunk_of = np.cumsum(new_tile | ((within % 128) == 0) & ~new_tile)
        # chunk_of 1-based; compress
        chunk_of -= 1
        num_chunks = int(chunk_of[-1]) + 1
    else:
        chunk_of = np.zeros(0, dtype=np.int64)
        num_chunks = 0
    cp = max(-(-num_chunks // group) * group, group)
    tile_base = np.zeros(cp, dtype=np.int32)
    cols_local = np.full((cp, 128), _SENTINEL_COL, dtype=np.int32)
    rows_flat = np.full(cp * 128, _PAD_ROW, dtype=np.int32)
    if e:
        cstart = np.zeros(num_chunks, dtype=np.int64)
        newc = np.empty(e, dtype=bool)
        newc[0] = True
        np.not_equal(chunk_of[1:], chunk_of[:-1], out=newc[1:])
        cstart[chunk_of[newc]] = np.where(newc)[0]
        slot = np.arange(e) - cstart[chunk_of]
        tile_base[chunk_of] = (tile << 7).astype(np.int32)
        cols_local[chunk_of, slot] = (cols_s & 127).astype(np.int32)
        rows_flat[chunk_of * 128 + slot] = rows_s.astype(np.int32)
    return tile_base, cols_local, rows_flat


def _colstream_kernel(tile_ref, cols_ref, x_hbm, out_ref, xtile, sems, *,
                      group, precision):
    i = pl.program_id(0)
    s = pl.num_programs(0)
    slots = 2 * group

    def dma(chunk, slot):
        base = pl.multiple_of(tile_ref[chunk], 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, 128), :], xtile.at[slot], sems.at[slot]
        )

    @pl.when(i == 0)
    def _():
        for g in range(group):
            dma(g, g % slots).start()

    @pl.when(i + 1 < s)
    def _():
        for g in range(group):
            c = (i + 1) * group + g
            dma(c, c % slots).start()

    # one-hot built TRANSPOSED (onehotT[j, e] = (j == col_local[e])) so the
    # cols row-vector broadcasts along sublanes without a [128]->[128,1]
    # relayout; the dot contracts lhs dim 0 (MXU-native transposed operand)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    for g in range(group):
        c = i * group + g
        dma(c, c % slots).wait()
        onehot_t = (lane == cols_ref[pl.ds(g, 1), :]).astype(xtile.dtype)
        out_ref[pl.ds(g * 128, 128), :] = jax.lax.dot_general(
            onehot_t, xtile[c % slots],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )


def colstream_gather(tile_base, cols_local, xp, *, group: int = 8):
    """Gathered rows ``[C*128, dp]`` (fp32) in column-sorted chunk order.

    tile_base: int32 [C] (C a multiple of ``group``), 128-aligned row
    bases into ``xp``; cols_local: int32 [C, 128] (128 = padding);
    xp: [>= max base + 128, dp].
    """
    c = tile_base.shape[0]
    assert c % group == 0, (c, group)
    dp = xp.shape[1]
    precision = (
        jax.lax.Precision.HIGHEST
        if xp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // group,),
        in_specs=[
            pl.BlockSpec((group, 128), lambda i, t_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((group * 128, dp), lambda i, t_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * group, 128, dp), xp.dtype),
            pltpu.SemaphoreType.DMA((2 * group,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_colstream_kernel, group=group,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c * 128, dp), jnp.float32),
        interpret=_interpret(),
    )(tile_base, cols_local, xp)


def colstream_spill(tile_base, cols_local, rows_flat, xp, out, *,
                    group: int = 8):
    """Full spill application: streamed gather + scatter-add onto ``out``
    (padded rows are INT32_MAX -> dropped)."""
    g = colstream_gather(tile_base, cols_local, xp, group=group)
    return out.at[rows_flat].add(g.astype(out.dtype), mode="drop")
