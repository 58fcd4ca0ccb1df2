"""Fetch-once X ring for the banded MXU path (``band_impl='ring'``).

The wide band kernel DMAs each superwindow's full X band from HBM; with
band_h=256 and W~640 consecutive supers' bands overlap 50-75%, so X band
traffic equals the A stream (~214 MB each at DD/dim96) and the re-fetch
is pure waste (docs/ROADMAP.md).  This kernel removes it:

  * The grid is ordered by ascending band start (host permutes the
    bucket's A blocks / sw_ids / pos accordingly).  With one width per
    bucket, both ends of the window advance monotonically, so each
    128-row X tile enters and leaves the working set exactly once.
  * A VMEM ring of S tiles holds the working set; a host-built fetch
    schedule (``build_ring_schedule``) fetches each tile from HBM once.
    When the window would wrap past the ring end, the host inserts a
    "rebase": the epoch restarts at slot 0 and the full window is
    re-fetched (bounded overhead: span/(S-span) of X, ~6% at S=32/W=640).
  * The dot reads the band as a dynamic 16-aligned sublane slice of the
    ring — keeping the single full-width MXU dot (K-accumulation inside
    one dot; the per-tile-pair formulation measured 2.8x slower, see
    ROADMAP "tiled" post-mortem).

Slot safety mirrors kernels/block_spmm._band_body_deep: grid steps run
sequentially on-core, so the hazards are (a) a prefetch overwriting a
slot a not-yet-executed step still reads, and (b) two in-flight DMAs
sharing a slot semaphore.  Both are detected on the HOST while building
the schedule and resolved by marking the fetch LATE (issued in its
owning step, immediately waited — a rare rebase-time stall).

Reference parity note: this is the TPU construction of the X-reuse the
reference gets from the GPU L2 (report §IV-B measures X loading at >60%
of TC-path time; its transposed smem staging, .cu:1441-1447, is the
per-window analog).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hcspmm_tpu.kernels.block_spmm import _interpret, _BAND_LOOKAHEAD

RING_TILES = 32  # S: ring capacity in 128-row X tiles (VMEM: S*128*dp*xbytes)


def pack_ring_schedule(ftile, fslot, fvalid, flate) -> np.ndarray:
    """Pack the four [Sb, F] schedule tables into ONE flat int32 array.

    Mosaic lane-pads every 2-D scalar-prefetch operand's minor dim to 128
    (a [Sb, 5] i32 table costs Sb*512 B of the 1 MB smem), so four tables
    overflow smem at ~500 supers.  Packed encoding per (step, k):
    ``tile << 7 | slot << 2 | late << 1 | valid`` — slot < 32 (RING_TILES),
    tile < 2**25 (plenty: 2**25 tiles = 4.3e9 X rows).
    """
    assert int(fslot.max(initial=0)) < 32 and int(ftile.max(initial=0)) < 2 ** 25
    packed = (ftile.astype(np.int64) << 7) | (fslot.astype(np.int64) << 2) \
        | (flate.astype(np.int64) << 1) | fvalid.astype(np.int64)
    return packed.astype(np.int32).reshape(-1)


def build_ring_schedule(starts: np.ndarray, w: int,
                        slots: int = RING_TILES,
                        lookahead: int = _BAND_LOOKAHEAD - 1,
                        ) -> Tuple[np.ndarray, ...]:
    """Host-side fetch schedule for ``band_ring_spmm_direct``.

    starts: int array [Sb] of 16-aligned band starts (UNSORTED — the
    returned ``order`` is the grid permutation the caller must apply to
    its A blocks / sw_ids).  Returns (order, pos, fetch_tile,
    fetch_slot, fetch_valid, fetch_late), where per sorted grid step s:
    ``pos[s]`` is the band's row offset into the ring buffer and
    ``fetch_*[s, :F]`` lists the tiles to DMA before step s runs
    (valid=0 entries are no-ops; late=1 entries must not be prefetched
    ``lookahead`` steps early — they are issued and waited in step s).
    """
    starts = np.asarray(starts, dtype=np.int64)
    span = w // 128 + 1  # max tiles under one window (16-aligned start)
    if slots < span + 2:
        raise ValueError(f"ring slots {slots} too small for width {w}")
    order = np.argsort(starts, kind="stable").astype(np.int32)
    st = starts[order]
    sb = len(st)
    t0 = st // 128
    t1 = (st + w - 1) // 128
    f_max = span
    ftile = np.zeros((sb, f_max), np.int32)
    fslot = np.zeros((sb, f_max), np.int32)
    fvalid = np.zeros((sb, f_max), np.int32)
    flate = np.zeros((sb, f_max), np.int32)
    pos = np.zeros(sb, np.int32)
    slot_last_fetch = np.full(slots, -(10 ** 9), np.int64)  # step idx
    base = None  # epoch base tile
    hi = -1      # highest tile fetched this epoch
    for s in range(sb):
        if base is None or t1[s] - base >= slots:
            base = int(t0[s])  # rebase: refetch the whole window
            hi = base - 1
        k = 0
        for t in range(max(int(t0[s]), hi + 1), int(t1[s]) + 1):
            ftile[s, k] = t
            fslot[s, k] = t - base
            fvalid[s, k] = 1
            k += 1
        hi = max(hi, int(t1[s]))
        pos[s] = st[s] - base * 128
        # hazard checks -> late marking
        for j in range(k):
            slot = int(fslot[s, j])
            lo, hi_r = slot * 128, slot * 128 + 128
            late = False
            # (a) an earlier, not-yet-run step still reads this slot
            for p in range(max(0, s - lookahead), s):
                if lo < pos[p] + w and hi_r > pos[p]:
                    late = True
                    break
            # (b) the slot's previous fetch may still be in flight when
            # the prefetch for this one would issue
            if s - slot_last_fetch[slot] <= lookahead:
                late = True
            flate[s, j] = int(late)
            slot_last_fetch[slot] = s
    return order, pos, ftile, fslot, fvalid, flate


def _ring_body(pos_ref, sched_ref, a_hbm, x_hbm, aring, ring, stage,
               asems, xsems, stsems, *, w, f_max, precision):
    """Shared ring step: run the fetch schedule for this grid step and
    return ``A_i @ band_i`` (fp32).  ``sched_ref`` is the flat packed
    schedule from ``pack_ring_schedule`` (1-D: 2-D scalar-prefetch
    operands are lane-padded to 128 words in smem and overflow it).

    The dot reads a STATIC double-buffered ``stage`` block, filled by an
    async VMEM->VMEM DMA from the ring at the dynamic band offset one
    step ahead.  Measured motivation (tools/ab_ring.py, v5e): slicing
    the ring dynamically in the dot's operand cost ~280 ns/super of
    in-critical-path copy (766 vs 522 us at DD/dim96) — the DMA engine
    does the same copy asynchronously behind the previous step's dot.
    Hazard note: a tile fetch for step s issues at s-(L-1), and the
    ring is read by staging copies for steps p in [s-L+2, s] issued at
    p-1 >= s-L+1 — the host's late-marking window [s-L+1, s-1] covers
    every reader of pre-fetch slot content (build_ring_schedule)."""
    i = pl.program_id(0)
    s = pl.num_programs(0)
    L = aring.shape[0]
    la = L - 1

    def a_dma(j, slot):
        return pltpu.make_async_copy(a_hbm.at[j], aring.at[slot],
                                     asems.at[slot])

    def x_dma(tile, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(tile * 128, 128), 128), :],
            ring.at[pl.ds(pl.multiple_of(slot * 128, 128), 128), :],
            xsems.at[slot],
        )

    def stage_dma(j):
        return pltpu.make_async_copy(
            ring.at[pl.ds(pl.multiple_of(pos_ref[j], 16), w), :],
            stage.at[j % 2],
            stsems.at[j % 2],
        )

    def start_fetches(j, late_val):
        for k in range(f_max):
            v = sched_ref[j * f_max + k]
            @pl.when(((v & 1) == 1) & (((v >> 1) & 1) == late_val))
            def _():
                x_dma(v >> 7, (v >> 2) & 31).start()

    def wait_fetches(j):
        for k in range(f_max):
            v = sched_ref[j * f_max + k]
            @pl.when((v & 1) == 1)
            def _():
                x_dma(v >> 7, (v >> 2) & 31).wait()

    @pl.when(i == 0)
    def _():
        a_dma(0, 0).start()
        start_fetches(0, 0)
        for j in range(1, la):
            @pl.when(j < s)
            def _():
                a_dma(j, j).start()
                start_fetches(j, 0)
        # step 0 has no previous step to stage for it: fetch-wait + late
        # + stage synchronously (pipeline fills from step 1 on)
        start_fetches(0, 1)
        wait_fetches(0)
        stage_dma(0).start()

    @pl.when(i + la < s)
    def _():
        a_dma(i + la, (i + la) % L).start()
        start_fetches(i + la, 0)

    a_dma(i, i % L).wait()
    # all ring reads for steps <= i must complete BEFORE any late fetch
    # for step i+1 overwrites a slot (late = hazardous to prefetch)
    stage_dma(i).wait()

    # stage the NEXT step's band: its tiles were prefetched la-1 steps
    # ago; late fetches (rebase hazards) are issued + waited here, then
    # the VMEM->VMEM band copy runs behind this step's dot
    @pl.when(i + 1 < s)
    def _():
        start_fetches(i + 1, 1)
        wait_fetches(i + 1)
        stage_dma(i + 1).start()

    band = stage[i % 2]
    return jnp.dot(
        aring[i % L].astype(band.dtype), band,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _ring_kernel(pos_ref, sw_ref, sched_ref,
                 a_hbm, x_hbm, out_ref, aring, ring, stage, asems, xsems,
                 stsems, *, w, f_max, precision):
    out_ref[0] = _ring_body(
        pos_ref, sched_ref, a_hbm, x_hbm,
        aring, ring, stage, asems, xsems, stsems,
        w=w, f_max=f_max, precision=precision,
    ).astype(out_ref.dtype)


def _ring_kernel_fused(pos_ref, sw_ref, sched_ref,
                       a_hbm, x_hbm, w_ref, agg_ref, out_ref, aring, ring,
                       stage, asems, xsems, stsems, *, w, f_max, precision):
    agg = _ring_body(
        pos_ref, sched_ref, a_hbm, x_hbm,
        aring, ring, stage, asems, xsems, stsems,
        w=w, f_max=f_max, precision=precision,
    )
    agg_ref[0] = agg.astype(agg_ref.dtype)
    out_ref[0] = jnp.dot(
        agg.astype(w_ref.dtype), w_ref[:],
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(out_ref.dtype)


def band_ring_spmm_direct(pos, sw_ids, sched,
                          a, xp, num_sw, out_dtype, *,
                          ring_tiles: int = RING_TILES):
    """Direct-write band SpMM with the fetch-once X ring.

    Inputs are in SORTED grid order (build_ring_schedule's ``order``
    applied to the bucket's A blocks and sw_ids by the plan builder).
    pos: int32 [Sb] ring row offsets; sched: flat packed int32 [Sb * F]
    (pack_ring_schedule); a: int8 [Sb, bh, W]; xp: [M, dp] with
    M % 128 == 0 covering every fetched tile.  Returns [num_sw, bh, dp]
    like band_bucket_spmm_direct (blocks not owned by this bucket are
    uninitialized garbage the caller overwrites/zeroes).
    """
    sb, bh, w = a.shape
    _, d = xp.shape
    assert sb == pos.shape[0] == sw_ids.shape[0]
    f_max = sched.shape[0] // sb
    precision = (
        jax.lax.Precision.HIGHEST
        if xp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    L = _BAND_LOOKAHEAD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bh, d),
                               lambda i, p_, s_, sc_: (s_[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, bh, w), a.dtype),
            pltpu.VMEM((ring_tiles * 128, d), xp.dtype),
            pltpu.VMEM((2, w, d), xp.dtype),
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA((ring_tiles,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ring_kernel, w=w, f_max=f_max,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_sw, bh, d), out_dtype),
        interpret=_interpret(),
    )(pos, sw_ids, sched, a, xp)


def band_ring_fused_direct(pos, sw_ids, sched,
                           a, xp, wm, num_sw, out_dtype, *,
                           ring_tiles: int = RING_TILES):
    """Ring twin of ``band_bucket_spmm_direct``'s fused form: one kernel
    computes ``agg = A_band @ band`` (X from the fetch-once ring) and
    ``out = agg @ W`` with the aggregate still in registers/VMEM.
    Returns (agg, out) like kernels.block_spmm.band_fused_spmm_direct."""
    sb, bh, w = a.shape
    _, d = xp.shape
    h = wm.shape[1]
    assert sb == pos.shape[0] == sw_ids.shape[0] == num_sw
    f_max = sched.shape[0] // sb
    precision = (
        jax.lax.Precision.HIGHEST
        if xp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    L = _BAND_LOOKAHEAD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W resident
        ],
        out_specs=(
            pl.BlockSpec((1, bh, d), lambda i, p_, s_, sc_: (s_[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, h), lambda i, p_, s_, sc_: (s_[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, bh, w), a.dtype),
            pltpu.VMEM((ring_tiles * 128, d), xp.dtype),
            pltpu.VMEM((2, w, d), xp.dtype),
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA((ring_tiles,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ring_kernel_fused, w=w, f_max=f_max,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_sw, bh, d), out_dtype),
            jax.ShapeDtypeStruct((num_sw, bh, h), out_dtype),
        ),
        interpret=_interpret(),
    )(pos, sw_ids, sched, a, xp, wm)
