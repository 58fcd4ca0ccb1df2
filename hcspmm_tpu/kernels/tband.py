"""Transposed-band Pallas kernel: the narrow-dim (dim <= 32/64) fast path.

TPU-native answer to the reference's dim-32/64 specializations
(hybrid_all_kernel.cu:1321-1476 `..._hybrid_32`, :1478-1637 `..._hybrid_64`
— the kernels behind every Table XVI number).  The wide band kernel
(kernels.block_spmm) computes per superwindow

    Y[R:R+bh, :dp] = A[bh, W] @ X[S:S+W, :dp]        (dp = 128 lanes)

whose MAC count is bh*W*128 regardless of the true feature dim: at dim 32
three quarters of the MXU lanes multiply zeros.  The folded layout
(band_fold=4) cut the X/out *bytes* but measured 1.7x SLOWER — its
[bh, W] @ [W, 32] dots fill 32/128 MXU output lanes, quadrupling the
per-A-element cost (artifacts/round3_hw.jsonl ab_fold_dim32).

The TRANSPOSED formulation keeps every lane busy WITHOUT folding A:
activations are carried as X^T [dt, M] (dt = feature dim, sublane axis;
M = padded rows, lane axis) and each superwindow computes

    Y^T[:dt, R:R+bh] = X^T[:dt, S:S+W] @ A_t[W, bh]

MACs are dt*W*bh — 4x fewer than the wide kernel at dt=32, 2x at 64,
0.75x at 96 — and the X^T/out streams are dt/128 of the padded-layout
bytes.  A_t is the int8 block transposed host-side at plan build; its
byte stream is unchanged (that wall is attacked separately via packing).
The layout is CLOSED under chaining: Y^T has the same [dt, M] shape, and
the dense update (X W)^T = W^T X^T keeps training steps transposed
end-to-end (ops.spmm wires that).

Band starts must be 128-aligned (lane-granular DMA): format.plan places
tband windows with align=128 (one extra 128-column pad vs the 16-aligned
wide layout).
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


# Same deep-pipeline depth as the wide kernel (kernels.block_spmm):
# lookahead L-1 over L slots removed a ~500 ns/super DMA stall there.
_TBAND_SLOTS = 4


def pack_a_nibble(at):
    """Host-side nibble packing of transposed band blocks: uint8
    [Sb, W, bh/2] where the LOW nibble of byte j holds output row j and
    the HIGH nibble holds row j + bh/2.  The in-kernel unpack is then
    two constant shifts + one concat at a 128-lane tile boundary —
    natural output order, no per-lane variable shifts, no permutation
    of the X column space (bh = 256 -> two aligned 128-lane groups)."""
    sb, w, bh = at.shape
    h = bh // 2
    a = at.astype(np.uint8) if at.dtype != np.uint8 else at
    return (a[:, :, :h] | (a[:, :, h:] << 4)).astype(np.uint8)


def pack_a_bits(at):
    """Host-side 1-bit packing along the W (contraction) axis: uint8
    [Sb, W/8, bh] where bit g of byte row w8 holds W-row g*(W/8) + w8.
    The unpack is 8 constant shift+mask passes concatenated along
    sublanes in group order — natural W order, so the X^T columns are
    NOT permuted (only A's internal storage is grouped)."""
    sb, w, bh = at.shape
    assert w % 8 == 0, w
    g = w // 8
    a = at.astype(np.uint8) if at.dtype != np.uint8 else at
    out = np.zeros((sb, g, bh), dtype=np.uint8)
    for i in range(8):
        out |= a[:, i * g:(i + 1) * g, :] << i
    return out


def _expand_a(a_raw, pack, dtype):
    """In-kernel expansion of a packed A_t block to [W, bh] ``dtype``."""
    if pack == 1:
        return a_raw.astype(dtype)
    # Mosaic legalizes neither uint8->bf16 casts nor 8-bit vector shifts
    # (arith.shrui on i8); widen the packed bytes to i32, shift/mask
    # there, and convert from i32.
    if pack == 2:
        v = a_raw.astype(jnp.int32)
        lo = v & 15
        hi = v >> 4
        return jnp.concatenate([lo, hi], axis=1).astype(dtype)
    if pack == 8:
        v = a_raw.astype(jnp.int32)
        parts = [(v >> k) & 1 for k in range(8)]
        return jnp.concatenate(parts, axis=0).astype(dtype)
    raise ValueError(f"pack={pack}")


def _tband_body(starts_ref, at_hbm, xt_hbm, ablk, xblk, asems, xsems, *,
                w, precision, pack=1):
    """Deep-pipelined transposed-band step: prefetch A_t block j and the
    lane slice ``xt[:, starts[j] : starts[j]+w]`` L-1 steps ahead, return
    ``xt_j @ A_t_j`` as [dt, bh] fp32.  Slot safety as in
    block_spmm._band_body_deep (sequential grid, lookahead L-1 never
    targets the slot step i reads)."""
    L = ablk.shape[0]
    la = L - 1
    i = pl.program_id(0)
    s = pl.num_programs(0)

    def a_dma(j, slot):
        return pltpu.make_async_copy(at_hbm.at[j], ablk.at[slot],
                                     asems.at[slot])

    def x_dma(j, slot):
        # plan-side tband starts are 128-aligned (lane tile granularity)
        start = pl.multiple_of(starts_ref[j], 128)
        return pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(start, w)],
            xblk.at[slot],
            xsems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        a_dma(0, 0).start()
        x_dma(0, 0).start()
        for j in range(1, la):
            @pl.when(j < s)
            def _():
                a_dma(j, j).start()
                x_dma(j, j).start()

    @pl.when(i + la < s)
    def _():
        a_dma(i + la, (i + la) % L).start()
        x_dma(i + la, (i + la) % L).start()

    a_dma(i, i % L).wait()
    x_dma(i, i % L).wait()
    return jnp.dot(
        xblk[i % L],
        _expand_a(ablk[i % L], pack, xblk.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _tband_scratch(at, xt, w):
    """VMEM slots sized to the STORED (possibly packed) A block shape."""
    L = _TBAND_SLOTS
    _, ws, bhs = at.shape
    dt = xt.shape[0]
    return [
        pltpu.VMEM((L, ws, bhs), at.dtype),
        pltpu.VMEM((L, dt, w), xt.dtype),
        pltpu.SemaphoreType.DMA((L,)),
        pltpu.SemaphoreType.DMA((L,)),
    ]


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _logical_wh(at, pack):
    """(contraction width W, output rows bh) of a stored A_t block."""
    _, ws, bhs = at.shape
    if pack == 2:
        return ws, bhs * 2
    if pack == 8:
        return ws * 8, bhs
    return ws, bhs


def _tband_kernel_direct(starts_ref, sw_ref, at_hbm, xt_hbm, out_ref,
                         ablk, xblk, asems, xsems, *, w, precision,
                         pack=1):
    acc = _tband_body(starts_ref, at_hbm, xt_hbm, ablk, xblk, asems,
                      xsems, w=w, precision=precision, pack=pack)
    out_ref[:] = acc.astype(out_ref.dtype)


def tband_spmm_direct(sw_ids, starts, at, xt, num_sw, out_dtype,
                      trash=None, pack=1):
    """Transposed-band SpMM, direct write: grid step i computes
    superwindow ``sw_ids[i]``'s output columns.

    starts: int32 [Sb] 128-aligned X^T lane offsets; at: int8
    [Sb, W, bh] transposed band blocks; xt: [dt, M] activations
    (dt = sublane-tiled feature dim, M >= max(start)+W).  Returns
    [dt, num_sw*bh] in ``out_dtype``.  Capacity-padded entries carry
    ``sw_id == num_sw`` and land in a trailing trash block.
    """
    sb = at.shape[0]
    w, bh = _logical_wh(at, pack)
    dt, _ = xt.shape
    if trash is None:
        trash = sb > num_sw
    precision = _precision(xt.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((dt, bh), lambda i, s_, w_: (0, w_[i]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_tband_scratch(at, xt, w),
    )
    out = pl.pallas_call(
        functools.partial(_tband_kernel_direct, w=w, precision=precision,
                          pack=pack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dt, (num_sw + int(trash)) * bh),
                                       out_dtype),
        interpret=_interpret(),
    )(starts, sw_ids, at, xt)
    return out[:, : num_sw * bh] if trash else out


def tband_spmm_bucket(starts, at, xt, pack=1):
    """Non-direct transposed-band call for secondary buckets: returns the
    [dt, Sb*bh] per-super outputs in bucket order (caller scatters)."""
    sb = at.shape[0]
    w, bh = _logical_wh(at, pack)
    dt, _ = xt.shape
    precision = _precision(xt.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((dt, bh), lambda i, s_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_tband_scratch(at, xt, w),
    )
    return pl.pallas_call(
        functools.partial(_tband_kernel_direct_nosw, w=w,
                          precision=precision, pack=pack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dt, sb * bh), jnp.float32),
        interpret=_interpret(),
    )(starts, at, xt)


def _tband_kernel_direct_nosw(starts_ref, at_hbm, xt_hbm, out_ref,
                              ablk, xblk, asems, xsems, *, w, precision,
                              pack=1):
    out_ref[:] = _tband_body(starts_ref, at_hbm, xt_hbm, ablk, xblk,
                             asems, xsems, w=w, precision=precision,
                             pack=pack)


def _tband_kernel_fused(starts_ref, sw_ref, at_hbm, xt_hbm, wt_ref,
                        agg_ref, out_ref, ablk, xblk, asems, xsems, *,
                        w, precision, pack=1):
    agg = _tband_body(starts_ref, at_hbm, xt_hbm, ablk, xblk, asems,
                      xsems, w=w, precision=precision, pack=pack)
    agg_ref[:] = agg.astype(agg_ref.dtype)
    out_ref[:] = jnp.dot(
        wt_ref[:],
        agg.astype(wt_ref.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


def tband_fused_direct(sw_ids, starts, at, xt, wt, num_sw, out_dtype,
                       pack=1):
    """Fused transposed aggregate+update: one kernel computes
    ``agg^T = X^T A_t`` and ``out^T = W^T agg^T`` per superwindow while
    the aggregate is VMEM-resident — the transposed edition of the
    reference's kernel fusion (hybrid_all_kernel.cu:1639-2770).

    wt: [ht, dt] transposed weight (ht = output dim, sublane-tiled).
    Returns (agg^T [dt, num_sw*bh], out^T [ht, num_sw*bh]).
    """
    sb = at.shape[0]
    w, bh = _logical_wh(at, pack)
    dt, _ = xt.shape
    ht = wt.shape[0]
    trash = int(sb > num_sw)
    precision = _precision(xt.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W^T resident
        ],
        out_specs=(
            pl.BlockSpec((dt, bh), lambda i, s_, w_: (0, w_[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, bh), lambda i, s_, w_: (0, w_[i]),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=_tband_scratch(at, xt, w),
    )
    agg, out = pl.pallas_call(
        functools.partial(_tband_kernel_fused, w=w, precision=precision,
                          pack=pack),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((dt, (num_sw + trash) * bh), out_dtype),
            jax.ShapeDtypeStruct((ht, (num_sw + trash) * bh), out_dtype),
        ),
        interpret=_interpret(),
    )(starts, sw_ids, at, xt, wt)
    if trash:
        agg = agg[:, : num_sw * bh]
        out = out[:, : num_sw * bh]
    return agg, out


# ---------------------------------------------------------------------------
# full transposed SpMM over the [dt, M] layout (+ glue for [N, d] callers)
# ---------------------------------------------------------------------------


# Spill population size above which the transposed spill path pads its
# row-layout operands to 128 lanes before the gather+merge: sub-128-lane
# random row gathers run ~6x slower per row (dp=32 measured 23.8 vs
# dp=128 4.0 ns/row, artifacts/round3_hw.jsonl take_parallel), so for
# large spills the two extra pad/slice passes repay themselves — but
# only while the PADDED table stays under the big-table gather wall
# (take degrades 3.9 -> 8.6 ns/row past ~200 MB, round-3 probe): at
# multi-million-row M the 128-lane pad quadruples the table and loses
# more to the wall + pad streams than the sublane penalty costs.
_SPILL_WIDE_MIN_EDGES = 100_000
_SPILL_WIDE_MAX_TABLE_MB = 256.0


def _tband_apply_spill(buf, arrs, xt, plan):
    """Additive spill population for tband plans.

    Lane path (default, ``config.spill_lane='auto'``): the whole merge
    runs in the transposed orientation via kernels/tspill.py — per-edge
    lane gathers from xt (or from an mxgather-built compact table past
    the lane-table wall) feed the block-wide one-hot tbstream merge
    aliased into ``buf``.  No full-array relayout passes.

    Legacy path (``spill_lane='off'`` or lane arrays absent): both
    operands transpose to [M, *] for the shared row-oriented merge
    (kernels.block_spmm.apply_spill) and the result transposes back —
    three [M, dt] passes, measured ~2.2 ms extra at YS@1.0
    (tools/profile_parts.py)."""
    from hcspmm_tpu.kernels.block_spmm import _has_spill, apply_spill

    if not _has_spill(arrs, plan):
        return buf
    if "ds_tlocal" in arrs:
        from hcspmm_tpu.kernels.tspill import (mxgather_lanes,
                                               segmented_gather,
                                               tbstream_merge)

        if "hub_lo" in arrs:
            # round-5 hub split: the hot (hub-column) edges merge FIRST
            # from a cache-resident hub table — built once by mxgather
            # and hot for its entire chunk stream, so none of these
            # edges pay the cold path's segment-table warming
            h = mxgather_lanes(xt, arrs["hub_lo"], arrs["hub_rel"],
                               span=plan.ts_span)
            gh = jnp.take(h, arrs["ds_h_laneg"], axis=1)
            buf = tbstream_merge(gh, arrs["ds_h_tlocal"],
                                 arrs["ds_h_lblk"], buf,
                                 group=plan.ds_hgroup)
        if "ts_lo" in arrs:
            src = mxgather_lanes(xt, arrs["ts_lo"], arrs["ts_rel"],
                                 span=plan.ts_span)
        else:
            src = xt
        if "ts2_ranks" in arrs and getattr(plan, "ts2_segs", None):
            # segmented second level: every take below the gather wall
            gathered = segmented_gather(
                src, arrs["ts2_ranks"], arrs["ds_laneg"], plan.ts2_segs,
                plan.ts2_pieces, bw=arrs["ds_tlocal"].shape[1])
        else:
            gathered = jnp.take(src, arrs["ds_laneg"], axis=1)
        return tbstream_merge(gathered, arrs["ds_tlocal"], arrs["ds_lblk"],
                              buf, group=plan.ds_lgroup)
    dt = buf.shape[0]
    tbl_mb = buf.shape[1] * 128 * jnp.dtype(xt.dtype).itemsize / 1e6
    # (measured on YS@1.0: padding a 1.7M-row space to 128 lanes for the
    # compact-build take LOST 2.7 ms — the pad passes cost more than the
    # sublane-gather penalty they remove; keep the pad small-table only)
    wide = (plan.spill_nnz >= _SPILL_WIDE_MIN_EDGES and dt < 128
            and tbl_mb <= _SPILL_WIDE_MAX_TABLE_MB)
    out_u = buf.T
    x_u = xt.T
    if wide:
        out_u = jnp.pad(out_u, ((0, 0), (0, 128 - dt)))
        x_u = jnp.pad(x_u, ((0, 0), (0, 128 - dt)))
    out_u = apply_spill(out_u, arrs, x_u, plan)
    if wide:
        out_u = out_u[:, :dt]
    return out_u.T.astype(buf.dtype)


def spmm_tband_padded(arrs, xt, plan, compute_dtype):
    """SpMM over the TRANSPOSED padded layout: xt [dt, M] -> [dt, M]
    (M = plan.padded_rows; rows of the original space live on lanes).
    Closed under application — chained SpMMs and whole GNN layers run
    with zero transpose/pad passes.  Caller gate:
    ops.spmm.spmm_padded_supported(plan) with plan.tband."""
    xt = xt.astype(compute_dtype)
    dt, m = xt.shape
    bh = plan.band_h
    num_sw = m // bh
    pack = plan.tband_pack
    nonempty = [i for i in range(len(plan.band_widths))
                if arrs[f"band{i}_start"].shape[0] > 0]
    if not nonempty:
        buf = jnp.zeros((dt, m), xt.dtype)
        return _tband_apply_spill(buf, arrs, xt, plan)
    s_main = max(nonempty, key=lambda i: len(plan.band_sw_ids[i]))
    buf = tband_spmm_direct(
        arrs[f"band{s_main}_sw"], arrs[f"band{s_main}_start"],
        arrs[f"band{s_main}_at"], xt, num_sw, xt.dtype,
        trash=(arrs[f"band{s_main}_start"].shape[0]
               > len(plan.band_sw_ids[s_main])),
        pack=pack,
    )
    extra = [i for i in nonempty if i != s_main]
    missing = arrs.get("band_missing_sw")
    if extra:
        # secondary buckets: scatter whole [dt, bh] column blocks over
        # the direct-write buffer (middle axis of the [dt, num_sw, bh]
        # view; capacity-padded sw ids carry num_sw -> dropped)
        b3 = buf.reshape(dt, num_sw, bh)
        for i in extra:
            part = tband_spmm_bucket(
                arrs[f"band{i}_start"], arrs[f"band{i}_at"], xt, pack=pack)
            sb = arrs[f"band{i}_start"].shape[0]
            b3 = b3.transpose(1, 0, 2).at[arrs[f"band{i}_sw"]].set(
                part.reshape(dt, sb, bh).transpose(1, 0, 2).astype(b3.dtype),
                mode="drop").transpose(1, 0, 2)
        buf = b3.reshape(dt, m)
    missing8 = arrs.get("band_missing_sw8")
    if (missing is not None and missing.shape[0]) or (
            missing8 is not None and missing8.shape[0]):
        # uncovered supers (their edges ride the spill population): an
        # aliased Pallas zero-fill writes only the missing blocks — the
        # XLA `.at[missing].set(0)` alternative lowers to a full-buffer
        # copy (683 us measured at YS@1.0, tools/profile_parts.py).
        # Aligned runs of 8 write as single [dt, 8*bh] blocks.
        from hcspmm_tpu.kernels.tspill import zero_lane_blocks

        if missing8 is not None and missing8.shape[0]:
            buf = zero_lane_blocks(buf, missing8, 8 * bh)
        if missing is not None and missing.shape[0]:
            buf = zero_lane_blocks(buf, missing, bh)
    return _tband_apply_spill(buf, arrs, xt, plan)


def sublane_pad(d: int) -> int:
    """Feature dim padded to the transposed layout's sublane tile."""
    return max(16, -(-d // 16) * 16)


def spmm_tband(arrs, x, plan, compute_dtype):
    """[N, d] -> [N, d] glue around the transposed padded core (one
    transpose in, one out — unpadded callers only; padded callers chain
    spmm_tband_padded directly)."""
    n, d = plan.num_nodes, x.shape[1]
    m = plan.padded_rows
    dt = sublane_pad(d)
    xt = jnp.zeros((dt, m), compute_dtype)
    xt = xt.at[:d, : x.shape[0]].set(x.T.astype(compute_dtype))
    out = spmm_tband_padded(arrs, xt, plan, compute_dtype)
    return out[:d, :n].T.astype(x.dtype)


def spmm_tband_fused_padded(arrs, xt, wt, plan):
    """Fused ``(out^T = W^T (A X)^T, agg^T = (A X)^T)`` in the transposed
    padded layout — single-bucket full-cover spill-free plans only (the
    aggregate stays in VMEM between the two dots); returns None otherwise
    (callers compose through spmm_tband_padded)."""
    if plan.has_spill:
        return None
    num_sw = plan.padded_rows // plan.band_h
    nonempty = [s for s in range(len(plan.band_widths))
                if arrs[f"band{s}_start"].shape[0] > 0]
    if len(nonempty) != 1 or len(plan.band_sw_ids[nonempty[0]]) != num_sw:
        return None
    s = nonempty[0]
    agg, out = tband_fused_direct(
        arrs[f"band{s}_sw"], arrs[f"band{s}_start"], arrs[f"band{s}_at"],
        xt, wt, num_sw, xt.dtype, pack=plan.tband_pack,
    )
    return out, agg
