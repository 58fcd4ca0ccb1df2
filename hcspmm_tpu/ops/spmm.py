"""Differentiable hybrid SpMM: ``Z = A @ X`` for a binary adjacency A.

This is the TPU equivalent of the reference kernel family
``spmm_forward_cuda_kernel_arbi_warps_hybrid_*`` (hybrid_all_kernel.cu:919-2770)
plus the autograd wiring of GNN_model.py:26-233:

- forward and backward aggregation are the *same* operator; the reference
  binds ``backward_*`` to the same launchers (hybrid_all.cpp:516-523) and
  reuses untransposed A in backward, which is exact only for symmetric
  graph structure (GNN_model.py:49-57).  ``make_spmm`` mirrors that by
  default and accepts an explicit transposed plan for the safe mode the
  reference lacks.
- aggregation is an unweighted neighbour sum (binary A; no value array
  anywhere in the reference kernels).

Implementations:
- ``impl='xla'``   : gather + batched matmul + sorted segment-sums under
  jit.  XLA fuses the element-wise work; the MXU handles the tile matmuls.
- ``impl='pallas'``: hand-written kernels (hcspmm_tpu.kernels) for the
  dense block path; falls back to XLA for the sparse residual.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.format.plan import ExecutionPlan, build_plan, transpose_csr


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _band_path_xla(arrs, xp, num_band: int, band_h: int, compute_dtype):
    """Banded MXU path: contiguous X slice per superwindow, one batched
    block-dense matmul per band-width bucket.  The XLA fallback expresses
    the contiguous slice as a structured gather; the Pallas kernel
    (kernels.block_spmm) replaces it with one sequential DMA."""
    d = xp.shape[1]
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    outs = []
    for s in range(num_band):
        starts = arrs[f"band{s}_start"]                    # [Sb]
        a = arrs[f"band{s}_a"].astype(compute_dtype)       # [Sb, bh, Bb]
        sb, bh, bb = a.shape
        idx = starts[:, None].astype(jnp.int32) + jnp.arange(bb, dtype=jnp.int32)
        xg = jnp.take(xp, idx, axis=0)                     # [Sb, Bb, D]
        part = jax.lax.dot_general(
            a,
            xg.astype(compute_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [Sb, bh, D]
        outs.append(part.reshape(sb * bh, d))
    return outs


def _dense_path_xla(arrs, xp, num_buckets: int, window_h: int, compute_dtype):
    """Width-bucketed block-dense MXU path: per-bucket gather + one batched
    matmul, no scatter (reduction over column blocks folds into the dot).

    Equivalent of the WMMA path (.cu:1385-1472): ``b*_a`` plays
    ``sparse_A`` (fused across the MAX_BLK loop), ``b*_cols`` plays
    ``sparse_AToX_index``.

    Precision: with fp32 compute we force HIGHEST so the MXU does true-fp32
    (multi-pass) accumulation — the TPU default bf16 pass would be *looser*
    than the reference's TF32 (SURVEY.md §7 hard part #6).  With bf16
    compute the single-pass MXU path is used (reference Table VII ran
    half/bf16 at the same quality).
    """
    d = xp.shape[1]
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    outs = []
    for b in range(num_buckets):
        cols = arrs[f"b{b}_cols"]                          # [Wb, Kb]
        a = arrs[f"b{b}_a"].astype(compute_dtype)          # [Wb, wh, Kb]
        wb = cols.shape[0]
        xg = jnp.take(xp, cols, axis=0)                    # [Wb, Kb, D] gather
        part = jax.lax.dot_general(
            a,
            xg.astype(compute_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [Wb, wh, D] fp32
        outs.append(part.reshape(wb * window_h, d))
    return outs


def _sparse_path_xla(arrs, xp, num_ell: int, num_sparse_rows: int, compute_dtype):
    """Scatter-free ELL path + residual segment-sum: the CUDA-core
    warp-per-row equivalent (.cu:964-1036).  Each degree bucket is one
    gather + one axis-sum; only rows wider than every ELL bucket fall back
    to a (slow on TPU) sorted scatter-add."""
    outs = []
    for e in range(num_ell):
        xe = jnp.take(xp, arrs[f"e{e}_cols"], axis=0)      # [Rb, De, D]
        outs.append(xe.astype(jnp.float32).sum(axis=1))    # [Rb, D]
    xe = jnp.take(xp, arrs["sparse_edge_col"], axis=0)     # [Es, D]
    outs.append(
        jax.ops.segment_sum(
            xe.astype(jnp.float32),
            arrs["sparse_edge_seg"],
            num_segments=num_sparse_rows + 1,
            indices_are_sorted=True,
        )[:num_sparse_rows]
    )
    return outs


def _spmm_xla(arrs, x, *, num_buckets, num_ell, num_band, window_h, band_h,
              num_sparse_rows, xp_rows, compute_dtype, num_spill_rows=0):
    n, d = x.shape
    # dummy zero row at N; extra zero rows up to xp_rows so band slices
    # near the top of the column space stay in bounds
    pad = max(xp_rows - n, 1)
    xp = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
    xp = xp.astype(compute_dtype)
    band_flats = _band_path_xla(arrs, xp, num_band, band_h, compute_dtype)
    dense_flats = _dense_path_xla(arrs, xp, num_buckets, window_h, compute_dtype)
    sparse_outs = _sparse_path_xla(arrs, xp, num_ell, num_sparse_rows, compute_dtype)
    allrows = jnp.concatenate(
        band_flats + dense_flats + sparse_outs + [jnp.zeros((1, d), jnp.float32)]
    )
    out = jnp.take(allrows, arrs["out_perm"], axis=0)
    if num_spill_rows and "spill_rows" in arrs:
        # band+spill additive residual (format.plan band_spill='auto'):
        # row padding is INT32_MAX -> dropped; col padding carries the
        # dropped segment sentinel, so its gathered value never lands
        # clip, not fill: pad col num_cols can be OOB for xp and would
        # gather NaN; the dump segment drops the row either way
        xe = jnp.take(xp, arrs["spill_edge_col"], axis=0, mode="clip")
        seg = jax.ops.segment_sum(
            xe.astype(jnp.float32), arrs["spill_edge_seg"],
            num_segments=num_spill_rows + 1, indices_are_sorted=True,
        )[:num_spill_rows]
        out = out.at[arrs["spill_rows"]].add(seg, mode="drop")
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnums=1)
def _expand_row_bits(packed: jnp.ndarray, rows: int) -> jnp.ndarray:
    """[S, rows/8, W] uint8 (bit i = row 8k+i, little order) -> int8
    [S, rows, W] — device-side unpack of bit-packed binary A blocks."""
    rep = jnp.repeat(packed, 8, axis=1)
    shifts = (jnp.arange(rows, dtype=jnp.uint8) % 8)[None, :, None]
    return ((rep >> shifts) & 1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=1)
def _tband_pack_dev(a8: jnp.ndarray, pack: int) -> jnp.ndarray:
    """Device-side re-pack of an unpacked int8 A_t [Sb, W, bh] into the
    tband kernel's stored form (kernels.tband pack_a_nibble/pack_a_bits
    layouts) — runs once at preprocess, after the bit-packed upload."""
    if pack == 2:
        h = a8.shape[2] // 2
        return (a8[:, :, :h].astype(jnp.uint8)
                | (a8[:, :, h:].astype(jnp.uint8) << 4))
    if pack == 8:
        g = a8.shape[1] // 8
        acc = a8[:, :g, :].astype(jnp.uint8)
        for i in range(1, 8):
            acc = acc | (a8[:, i * g:(i + 1) * g, :].astype(jnp.uint8) << i)
        return acc
    return a8


def _float0_zeros(tree):
    """float0 cotangents for integer-dtype plan arrays."""
    import jax.dtypes

    return jax.tree.map(
        lambda t: np.zeros(t.shape, jax.dtypes.float0), tree
    )


def make_spmm(
    plan: ExecutionPlan,
    plan_bwd: Optional[ExecutionPlan] = None,
    compute_dtype: str = "float32",
    impl: str = "xla",
) -> Callable:
    """Build a differentiable ``spmm(arrs_f, arrs_b, X) -> A @ X`` for one
    graph.  The plan arrays are *arguments*, not closure constants: a
    closed-over 170 MB array costs minutes of XLA compile (it is serialized
    into the module and constant-folded); as arguments the same program
    compiles in under a second.  Callers thread ``HybridSpMM.arrays``
    through their jit boundaries.

    ``plan_bwd=None`` reuses the forward plan in the VJP (the reference's
    symmetric-structure assumption); pass a plan built on A^T for exactness
    on directed graphs.
    """
    cd = _dtype(compute_dtype)
    pb = plan if plan_bwd is None else plan_bwd
    fwd_impl, bwd_impl = _build_impls(plan, pb, cd, impl)

    @jax.custom_vjp
    def spmm(arrs_f, arrs_b, x):
        return fwd_impl(arrs_f, x)

    def spmm_fwd(arrs_f, arrs_b, x):
        return fwd_impl(arrs_f, x), (arrs_f, arrs_b)

    def spmm_bwd(res, g):
        arrs_f, arrs_b = res
        return (
            _float0_zeros(arrs_f),
            _float0_zeros(arrs_b),
            bwd_impl(arrs_b, g),
        )

    spmm.defvjp(spmm_fwd, spmm_bwd)
    return spmm


def make_spmm_padded(
    plan: ExecutionPlan,
    plan_bwd: Optional[ExecutionPlan] = None,
    compute_dtype: str = "float32",
) -> Optional[Callable]:
    """Differentiable SpMM over the closed padded layout [M, dp] -> [M, dp]
    (see kernels.block_spmm.spmm_pallas_padded): zero pad/slice/merge
    passes per application.  Returns None when the plan doesn't support
    it (caller uses the unpadded op)."""
    from hcspmm_tpu.kernels.block_spmm import (
        spmm_padded_supported, spmm_pallas_padded)

    pb = plan if plan_bwd is None else plan_bwd
    if not (spmm_padded_supported(plan) and spmm_padded_supported(pb)
            and pb.padded_rows == plan.padded_rows
            and getattr(pb, "tband", False)
            == getattr(plan, "tband", False)):
        return None
    cd = _dtype(compute_dtype)

    @jax.custom_vjp
    def spmm_p(arrs_f, arrs_b, xp):
        return spmm_pallas_padded(arrs_f, xp, plan, cd)

    def fwd(arrs_f, arrs_b, xp):
        return spmm_pallas_padded(arrs_f, xp, plan, cd), (arrs_f, arrs_b)

    def bwd(res, g):
        arrs_f, arrs_b = res
        return (
            _float0_zeros(arrs_f),
            _float0_zeros(arrs_b),
            spmm_pallas_padded(arrs_b, g, pb, cd),
        )

    spmm_p.defvjp(fwd, bwd)
    return spmm_p


def _pad_w_lane(w, dpin, cd):
    """Zero-pad a weight matrix into the padded layout's lane space."""
    dpo = -(-w.shape[1] // 128) * 128
    return jnp.pad(w.astype(cd),
                   ((0, dpin - w.shape[0]), (0, dpo - w.shape[1])))


def _make_fused_ops_tband(plan, pb, cd):
    """Fused GCN/GIN layer cores in the TRANSPOSED padded layout [dt, M]
    (plan.tband, kernels/tband.py).  The dense update is W^T X^T (a
    [ht, dt] @ [dt, M] dot — M on lanes keeps the MXU full), and the
    fused kernel computes (agg^T, W-form @ agg^T) with the aggregate
    VMEM-resident.  Weights stay UNPADDED in the params pytree."""
    from hcspmm_tpu.kernels.tband import (spmm_tband_fused_padded,
                                          sublane_pad)
    from hcspmm_tpu.kernels.block_spmm import spmm_pallas_padded

    def _wt(w, dint, cd_):
        # transposed padded weight [ht, dint] = (pad W)^T
        ht = sublane_pad(w.shape[1])
        return jnp.pad(w.T.astype(cd_),
                       ((0, ht - w.shape[1]), (0, dint - w.shape[0])))

    def _wf(w, dint, ht, cd_):
        # forward-form padded weight [dint, ht] (left-multiplies agg^T)
        return jnp.pad(w.astype(cd_),
                       ((0, dint - w.shape[0]), (0, ht - w.shape[1])))

    def _dw(xt, adzt, w):
        # contract the two transposed activations over M (lanes)
        m = jax.lax.dot_general(
            xt, adzt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m[: w.shape[0], : w.shape[1]].astype(w.dtype)

    def fused(p, arrs, xt, wform):
        # Composition is the DEFAULT: the round-5 Table VI analog
        # (artifacts/fusion_ablation_r5.jsonl) measured the hand-fused
        # two-output band kernel 65% SLOWER than SpMM + separate dot on
        # zero-spill plans — the extra output stream breaks the deep DMA
        # pipeline, while the aggregate's HBM round trip at dt<=64 costs
        # only ~2*M*dt*2 bytes.  The reference's 30.6% fused-backward win
        # (report Table VI) came from re-reading CSR on GPU; XLA's own
        # scheduling already covers that here.
        if getattr(p, "prefer_fused_kernel", False):
            res = spmm_tband_fused_padded(arrs, xt, wform, p)
            if res is not None:
                return res
        agg = spmm_pallas_padded(arrs, xt, p, cd)
        out = jnp.dot(wform, agg.astype(wform.dtype),
                      preferred_element_type=jnp.float32).astype(xt.dtype)
        return out, agg

    @jax.custom_vjp
    def gcn_p(arrs_f, arrs_b, xt, w):
        h = jnp.dot(_wt(w, xt.shape[0], xt.dtype), xt,
                    preferred_element_type=jnp.float32).astype(xt.dtype)
        return spmm_pallas_padded(arrs_f, h, plan, cd)

    def gcn_fwd(arrs_f, arrs_b, xt, w):
        return gcn_p(arrs_f, arrs_b, xt, w), (arrs_f, arrs_b, xt, w)

    def gcn_bwd(res, g):
        arrs_f, arrs_b, xt, w = res
        # fused backward: one kernel computes adz^T = (A dZ)^T and
        # dX^T = W_pad @ adz^T (the Table VI analog, transposed edition)
        wf = _wf(w, xt.shape[0], g.shape[0], g.dtype)
        dxt, adzt = fused(pb, arrs_b, g, wf)
        dw = _dw(xt, adzt, w)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b),
                dxt.astype(xt.dtype), dw)

    gcn_p.defvjp(gcn_fwd, gcn_bwd)

    @jax.custom_vjp
    def gin_p(arrs_f, arrs_b, xt, w):
        out, _ = fused(plan, arrs_f, xt, _wt(w, xt.shape[0], xt.dtype))
        return out

    def gin_fwd(arrs_f, arrs_b, xt, w):
        out, agg = fused(plan, arrs_f, xt, _wt(w, xt.shape[0], xt.dtype))
        return out, (arrs_f, arrs_b, w, agg)

    def gin_bwd(res, g):
        arrs_f, arrs_b, w, agg = res
        wf = _wf(w, agg.shape[0], g.shape[0], g.dtype)
        daggt = jnp.dot(wf, g, preferred_element_type=jnp.float32
                        ).astype(g.dtype)
        dxt = spmm_pallas_padded(arrs_b, daggt, pb, cd)
        dw = _dw(agg, g, w)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b),
                dxt.astype(g.dtype), dw)

    gin_p.defvjp(gin_fwd, gin_bwd)
    return {"gcn": gcn_p, "gin": gin_p}


def make_fused_ops_padded(
    plan: ExecutionPlan,
    plan_bwd: Optional[ExecutionPlan] = None,
    compute_dtype: str = "float32",
):
    """Differentiable fused GCN/GIN layer cores over the closed padded
    layout: the aggregate stays in VMEM between the two matmuls
    (kernels.block_spmm.spmm_fused_pallas_padded), and GCN's backward is
    the fused (A dZ) W^T + A dZ single launch — the reference's Table VI
    win, padded-layout edition.  Weights stay UNPADDED in the params
    pytree (padding happens inside; gradients are sliced back exactly —
    zero-padded activation rows/cols contribute zero).  Returns None
    when the plan lacks the padded fast path."""
    from hcspmm_tpu.kernels.block_spmm import (
        spmm_fused_pallas_padded, spmm_padded_supported, spmm_pallas_padded)

    pb = plan if plan_bwd is None else plan_bwd
    if not (spmm_padded_supported(plan) and spmm_padded_supported(pb)
            and pb.padded_rows == plan.padded_rows
            and getattr(pb, "tband", False)
            == getattr(plan, "tband", False)):
        return None
    cd = _dtype(compute_dtype)
    if getattr(plan, "tband", False):
        return _make_fused_ops_tband(plan, pb, cd)

    def _pw(w, dpin, cd_):
        return _pad_w_lane(w, dpin, cd_)

    def _dw_of(m, w):
        return m[: w.shape[0], : w.shape[1]].astype(w.dtype)

    def fused(p, arrs, xp, wp):
        # composed by default — see _make_fused_ops_tband.fused (the
        # wide-layout fused kernel measured 70% slower than composition
        # at dim 96; artifacts/fusion_ablation_r5.jsonl)
        if getattr(p, "prefer_fused_kernel", False):
            res = spmm_fused_pallas_padded(arrs, xp, wp, p)
            if res is not None:
                return res
        agg = spmm_pallas_padded(arrs, xp, p, cd)
        out = jnp.dot(agg, wp, preferred_element_type=jnp.float32
                      ).astype(xp.dtype)
        return out, agg

    @jax.custom_vjp
    def gcn_p(arrs_f, arrs_b, xp, w):
        xw = jnp.dot(xp, _pw(w, xp.shape[1], xp.dtype),
                     preferred_element_type=jnp.float32).astype(xp.dtype)
        return spmm_pallas_padded(arrs_f, xw, plan, cd)

    def gcn_fwd(arrs_f, arrs_b, xp, w):
        return gcn_p(arrs_f, arrs_b, xp, w), (arrs_f, arrs_b, xp, w)

    def gcn_bwd(res, g):
        arrs_f, arrs_b, xp, w = res
        wp = _pw(w, xp.shape[1], g.dtype)
        # fused backward: one kernel computes dX = (A dZ) W^T AND the
        # A dZ residual for dW
        dx, adz = fused(pb, arrs_b, g, wp.T)
        dw = _dw_of(jnp.dot(xp.T, adz,
                            preferred_element_type=jnp.float32), w)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b),
                dx.astype(xp.dtype), dw)

    gcn_p.defvjp(gcn_fwd, gcn_bwd)

    @jax.custom_vjp
    def gin_p(arrs_f, arrs_b, xp, w):
        out, _ = fused(plan, arrs_f, xp, _pw(w, xp.shape[1], xp.dtype))
        return out

    def gin_fwd(arrs_f, arrs_b, xp, w):
        out, agg = fused(plan, arrs_f, xp, _pw(w, xp.shape[1], xp.dtype))
        return out, (arrs_f, arrs_b, w, agg)

    def gin_bwd(res, g):
        arrs_f, arrs_b, w, agg = res
        wp = _pw(w, agg.shape[1], g.dtype)
        dagg = jnp.dot(g, wp.T, preferred_element_type=jnp.float32
                       ).astype(g.dtype)
        dx = spmm_pallas_padded(arrs_b, dagg, pb, cd)
        dw = _dw_of(jnp.dot(agg.T, g,
                            preferred_element_type=jnp.float32), w)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b),
                dx.astype(g.dtype), dw)

    gin_p.defvjp(gin_fwd, gin_bwd)
    return {"gcn": gcn_p, "gin": gin_p}


def _build_impls(plan, pb, cd, impl):
    if impl == "pallas":
        from hcspmm_tpu.kernels.block_spmm import spmm_pallas

        def fwd_impl(arrs_f, x):
            return spmm_pallas(arrs_f, x, plan, cd)

        def bwd_impl(arrs_b, g):
            return spmm_pallas(arrs_b, g, pb, cd)
    elif impl == "xla":
        def fwd_impl(arrs_f, x):
            return _spmm_xla(
                arrs_f, x,
                num_buckets=len(plan.bucket_widths),
                num_ell=len(plan.ell_widths),
                num_band=len(plan.band_widths), window_h=plan.window_h,
                band_h=plan.band_h, num_sparse_rows=plan.num_sparse_rows,
                xp_rows=plan.xp_rows, compute_dtype=cd,
                num_spill_rows=plan.num_spill_rows if plan.has_spill else 0,
            )

        def bwd_impl(arrs_b, g):
            return _spmm_xla(
                arrs_b, g,
                num_buckets=len(pb.bucket_widths),
                num_ell=len(pb.ell_widths),
                num_band=len(pb.band_widths), window_h=pb.window_h,
                band_h=pb.band_h, num_sparse_rows=pb.num_sparse_rows,
                xp_rows=pb.xp_rows, compute_dtype=cd,
                num_spill_rows=pb.num_spill_rows if pb.has_spill else 0,
            )
    else:
        raise ValueError(f"unknown impl: {impl}")
    return fwd_impl, bwd_impl


def _fused_impl(plan, cd, impl, fwd_impl):
    """((A@X) @ W, A@X) forward: composed by default — the round-5
    Table VI analog (artifacts/fusion_ablation_r5.jsonl) measured the
    hand-fused Pallas kernel 65-70% slower than SpMM + separate dot (the
    second output stream breaks the deep DMA pipeline; XLA already
    schedules the composition).  ``plan.prefer_fused_kernel`` re-enables
    the kernel (the reference ships these as separate fused kernels,
    hybrid_all_kernel.cu:1639-2770)."""
    if impl == "pallas" and getattr(plan, "prefer_fused_kernel", False):
        from hcspmm_tpu.kernels.block_spmm import spmm_fused_pallas

        def run(arrs, x, w):
            res = spmm_fused_pallas(arrs, x, w, plan, cd)
            if res is not None:
                return res
            agg = fwd_impl(arrs, x)
            return jnp.dot(agg, w, preferred_element_type=jnp.float32
                           ).astype(x.dtype), agg
    else:
        def run(arrs, x, w):
            agg = fwd_impl(arrs, x)
            return jnp.dot(agg, w, preferred_element_type=jnp.float32
                           ).astype(x.dtype), agg
    return run


def make_fused_ops(
    plan: ExecutionPlan,
    plan_bwd: Optional[ExecutionPlan] = None,
    compute_dtype: str = "float32",
    impl: str = "xla",
):
    """Differentiable fused layer ops mirroring the reference autograd:

    - ``gin(arrs_f, arrs_b, x, w) -> (A x) w`` — HCSPMMFunction_GINFixed32
      (GNN_model.py:166-184): fused forward, backward = one aggregation
      of (dZ w^T) plus a GEMM for dW against the saved aggregate.
    - ``gcn(arrs_f, arrs_b, x, w) -> A (x w)`` — HCSPMMFunctionFixed32
      (GNN_model.py:82-103): plain forward, *fused backward*: one kernel
      produces (A dZ) w^T = dX and A dZ; dW = x^T (A dZ).  This is the
      paper's 30.6%-avg fused-backward win (Table VI), Pallas-style.
    """
    cd = _dtype(compute_dtype)
    pb = plan if plan_bwd is None else plan_bwd
    fwd_impl, bwd_impl = _build_impls(plan, pb, cd, impl)
    fused_f = _fused_impl(plan, cd, impl, fwd_impl)
    fused_b = _fused_impl(pb, cd, impl, bwd_impl)

    @jax.custom_vjp
    def gin(arrs_f, arrs_b, x, w):
        out, _ = fused_f(arrs_f, x, w)
        return out

    def gin_fwd(arrs_f, arrs_b, x, w):
        out, agg = fused_f(arrs_f, x, w)
        return out, (arrs_f, arrs_b, x, w, agg)

    def gin_bwd(res, g):
        arrs_f, arrs_b, x, w, agg = res
        dagg = jnp.dot(g, w.T, preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        dx = bwd_impl(arrs_b, dagg)
        dw = jnp.dot(agg.T, g, preferred_element_type=jnp.float32
                     ).astype(w.dtype)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b), dx, dw)

    gin.defvjp(gin_fwd, gin_bwd)

    @jax.custom_vjp
    def gcn(arrs_f, arrs_b, x, w):
        xw = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        return fwd_impl(arrs_f, xw)

    def gcn_fwd(arrs_f, arrs_b, x, w):
        xw = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        return fwd_impl(arrs_f, xw), (arrs_f, arrs_b, x, w)

    def gcn_bwd(res, g):
        arrs_f, arrs_b, x, w = res
        # fused backward: (A dZ) w^T and A dZ from one kernel
        dx, adz = fused_b(arrs_b, g, w.T.astype(g.dtype))
        dw = jnp.dot(x.T, adz, preferred_element_type=jnp.float32
                     ).astype(w.dtype)
        return (_float0_zeros(arrs_f), _float0_zeros(arrs_b), dx, dw)

    gcn.defvjp(gcn_fwd, gcn_bwd)
    return {"gin": gin, "gcn": gcn}


class HybridSpMM:
    """Convenience wrapper: CSR graph -> plan(s) -> differentiable operator.

    The analog of the reference flow ``HYGNN.preprocess(...)`` +
    ``HCSPMM.forward*`` (HC-SpMM_main.py:52, GNN_model.py), collapsed into
    one object: construction runs preprocessing, ``__call__`` aggregates.
    """

    def __init__(
        self,
        row_pointers: np.ndarray,
        column_index: np.ndarray,
        num_nodes: int,
        config: PlanConfig = PlanConfig(),
        symmetric: bool = True,
        normalize: bool = False,
    ):
        """``normalize=True`` computes D^-1/2 A D^-1/2 X (symmetric GCN
        normalization).  The reference computes sqrt-degrees and never
        applies them (dataset.py:106-107; its kernels sum unweighted), so
        False reproduces reference semantics (SURVEY.md §7 checklist)."""
        self.config = config
        self.normalize = normalize
        self.plan = build_plan(row_pointers, column_index, num_nodes, config)
        if symmetric:
            self.plan_bwd = None
        else:
            rp_t, ci_t = transpose_csr(row_pointers, column_index, num_nodes)
            self.plan_bwd = build_plan(rp_t, ci_t, num_nodes, config)
        self._fn = make_spmm(
            self.plan, self.plan_bwd,
            compute_dtype=config.compute_dtype, impl=config.impl,
        )
        self._fused = make_fused_ops(
            self.plan, self.plan_bwd,
            compute_dtype=config.compute_dtype, impl=config.impl,
        )
        self._fn_padded = (
            make_spmm_padded(self.plan, self.plan_bwd,
                             compute_dtype=config.compute_dtype)
            if config.impl == "pallas" else None
        )
        self._fused_padded = (
            make_fused_ops_padded(self.plan, self.plan_bwd,
                                  compute_dtype=config.compute_dtype)
            if config.impl == "pallas" else None
        )
        def to_device(plan):
            # Plans carry band A as compact edge triples; densify on host,
            # then upload the binary blocks BIT-PACKED along the row axis
            # (8x fewer bytes over the host->device link) and expand once
            # on device with a jitted shift-and-mask — a single fused
            # elementwise pass.  (A device-side edge scatter was tried
            # and measured ~40 s: XLA scatter of 1.7M updates serializes.)
            tband = getattr(plan, "tband", False)
            out = {}
            if tband:
                # transposed band blocks: bit-packed upload + device
                # expand, then re-pack on device into the kernel's stored
                # form (int8 / nibble / bit — config.tband_pack)
                for s in range(len(plan.band_widths)):
                    at8 = plan.band_at_dense(s)
                    if at8.size and at8.shape[1] % 8 == 0:
                        packed = np.packbits(at8.view(np.uint8), axis=1,
                                             bitorder="little")
                        a = _expand_row_bits(jnp.asarray(packed),
                                             at8.shape[1])
                    else:
                        a = jnp.asarray(at8)
                    if plan.tband_pack in (2, 8):
                        if at8.size:
                            a = _tband_pack_dev(a, plan.tband_pack)
                        else:
                            from hcspmm_tpu.kernels.tband import (
                                pack_a_bits, pack_a_nibble)

                            a = jnp.asarray(
                                pack_a_nibble(at8) if plan.tband_pack == 2
                                else pack_a_bits(at8))
                    out[f"band{s}_at"] = a
            for k, v in plan.device_arrays(dense_band=not tband).items():
                is_band_a = k.endswith("_a") and (
                    k.startswith("band") or k.startswith("tp")
                )
                if is_band_a and v.ndim == 3 and v.shape[1] % 8 == 0:
                    # 0/1 int8 blocks reinterpret as uint8 zero-copy —
                    # astype here copied the full dense band (171 MB at
                    # DD scale, ~2.4 s of fresh-page writes on this VM)
                    bits = v.view(np.uint8) if v.dtype == np.int8 \
                        else v.astype(np.uint8)
                    packed = np.packbits(bits, axis=1, bitorder="little")
                    a = _expand_row_bits(jnp.asarray(packed), v.shape[1])
                else:
                    a = jnp.asarray(v)
                if config.a_dtype == "int4" and is_band_a:
                    a = a.astype(jnp.int4)
                out[k] = a
            return out

        arrs_f = to_device(self.plan)
        if self.plan_bwd is None:
            arrs_b = arrs_f
        else:
            arrs_b = to_device(self.plan_bwd)
        #: pytree of plan arrays — thread this through YOUR jit boundary
        #: (see make_spmm docstring) and call ``apply(arrays, x)``
        self.arrays = {"f": arrs_f, "b": arrs_b}
        deg = np.maximum(np.diff(np.asarray(row_pointers)), 1)
        #: 1/deg — mean aggregation (GraphSAGE mean_N = D^-1 A X)
        self.arrays["inv_deg"] = jnp.asarray(
            1.0 / deg.astype(np.float32)
        )
        if normalize:
            self.arrays["inv_sqrt_deg"] = jnp.asarray(
                1.0 / np.sqrt(deg.astype(np.float32))
            )

    # ---- closed padded layout: [M, dp] -> [M, dp], zero glue passes ----

    @property
    def supports_padded(self) -> bool:
        """True when ``apply_padded`` runs the zero-glue fast path."""
        return self._fn_padded is not None

    @property
    def padded_rows(self) -> int:
        return self.plan.padded_rows

    @property
    def _padded_transposed(self) -> bool:
        """True when the padded layout is the tband TRANSPOSED [dt, M]
        form.  Requires the padded fast path to exist: when a tband plan
        lacks it (e.g. partial cover with dense/sparse row-merge
        populations, as PT+rcm builds), ``_padded_core`` falls back to
        the unpadded op on ``xp[:n]`` — a ROW-layout slice — so
        ``pad_input`` must emit the row layout too (mixing them fed a
        [dt, M] array to the [N, d] op and blew up as a square [M, M]
        pad, parity_r5 PT tband/rcm candidate error)."""
        return (getattr(self.plan, "tband", False)
                and self._fn_padded is not None)

    def pad_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """[N, D] -> padded [M, dp] in compute dtype (one-time cost; the
        layout then stays closed across ``apply_padded`` chains/layers)."""
        n, d = x.shape
        m = self.plan.padded_rows
        xp = x.astype(_dtype(self.config.compute_dtype))
        if self._padded_transposed:
            # transposed padded layout [dt, M] (kernels/tband.py)
            from hcspmm_tpu.kernels.tband import sublane_pad

            dt = sublane_pad(d)
            xt = jnp.zeros((dt, m), xp.dtype)
            return xt.at[:d, :n].set(xp.T)
        dp = -(-d // 128) * 128
        return jnp.pad(xp, ((0, m - n), (0, dp - d)))

    def unpad_output(self, xp: jnp.ndarray, d: Optional[int] = None,
                     dtype=None) -> jnp.ndarray:
        """Padded [M, dp] (or transposed [dt, M]) -> [N, d]."""
        n = self.plan.num_nodes
        if self._padded_transposed:
            out = (xp[:, :n] if d is None else xp[:d, :n]).T
            return out if dtype is None else out.astype(dtype)
        out = xp[:n] if d is None else xp[:n, :d]
        return out if dtype is None else out.astype(dtype)

    def _inv_lanes(self, inv, xp, fill=1.0):
        """Per-original-row scale vector broadcast into the padded (or
        transposed) activation layout; padded rows get ``fill``."""
        if self._padded_transposed:
            invp = jnp.pad(inv, (0, xp.shape[1] - inv.shape[0]),
                           constant_values=fill)
            return invp[None, :]
        invp = jnp.pad(inv, (0, xp.shape[0] - inv.shape[0]),
                       constant_values=fill)
        return invp[:, None]

    def pad_weight(self, w, xp):
        """Weight in the lane-padded form matching ``xp``'s layout
        (models.layers.SAGEConv and the unfused layer paths use this).
        tband layouts have no right-multiply form — use ``dense_padded``
        instead."""
        if self._padded_transposed:
            raise ValueError("tband layout: use dense_padded(xp, w), the "
                             "update is W^T @ X^T")
        return _pad_w_lane(w, xp.shape[1], xp.dtype)

    def dense_padded(self, xp, w):
        """Dense update ``X W`` in the operator's padded layout: xp @ Wpad
        for row layouts, (pad W)^T @ xt for the transposed layout."""
        if self._padded_transposed:
            from hcspmm_tpu.kernels.tband import sublane_pad

            ht = sublane_pad(w.shape[1])
            wt = jnp.pad(w.T.astype(xp.dtype),
                         ((0, ht - w.shape[1]),
                          (0, xp.shape[0] - w.shape[0])))
            return jnp.dot(wt, xp,
                           preferred_element_type=jnp.float32
                           ).astype(xp.dtype)
        return jnp.dot(xp, self.pad_weight(w, xp),
                       preferred_element_type=jnp.float32).astype(xp.dtype)

    def apply_padded(self, arrays, xp: jnp.ndarray) -> jnp.ndarray:
        """SpMM in the padded layout.  Falls back to the unpadded op
        (correct, slower) when the plan lacks the fast path."""
        if "inv_sqrt_deg" in arrays:
            inv = self._inv_lanes(arrays["inv_sqrt_deg"], xp)
            xs = (xp * inv).astype(xp.dtype)
            out = (self._padded_core(arrays, xs) * inv).astype(xp.dtype)
            return out
        return self._padded_core(arrays, xp)

    def _padded_core(self, arrays, xp):
        if self._fn_padded is not None:
            return self._fn_padded(arrays["f"], arrays["b"], xp)
        n = self.plan.num_nodes
        out = self._fn(arrays["f"], arrays["b"], xp[:n])
        return jnp.pad(out.astype(xp.dtype), ((0, xp.shape[0] - n), (0, 0)))

    def gcn_apply_padded(self, arrays, xp: jnp.ndarray,
                         w: jnp.ndarray) -> jnp.ndarray:
        """Fused GCN layer core A (Xp W) in the padded layout (fused
        backward: one kernel for (A dZ) W^T and A dZ).  Composes through
        ``apply_padded`` in normalized mode or when unsupported."""
        if self._fused_padded is not None and "inv_sqrt_deg" not in arrays:
            return self._fused_padded["gcn"](arrays["f"], arrays["b"], xp, w)
        return self.apply_padded(arrays, self.dense_padded(xp, w))

    def gin_apply_padded(self, arrays, xp: jnp.ndarray,
                         w: jnp.ndarray) -> jnp.ndarray:
        """Fused GIN layer core (A Xp) W in the padded layout."""
        if self._fused_padded is not None and "inv_sqrt_deg" not in arrays:
            return self._fused_padded["gin"](arrays["f"], arrays["b"], xp, w)
        agg = self.apply_padded(arrays, xp)
        return self.dense_padded(agg, w)

    def mean_apply(self, arrays, x: jnp.ndarray) -> jnp.ndarray:
        """Mean aggregation ``D^-1 A X`` (GraphSAGE's mean_N).  Uses the
        raw aggregate regardless of ``normalize`` (SAGE's own scaling)."""
        agg = self._fn(arrays["f"], arrays["b"], x)
        return (agg * arrays["inv_deg"][:, None]).astype(x.dtype)

    def mean_apply_padded(self, arrays, xp: jnp.ndarray) -> jnp.ndarray:
        """Mean aggregation in the closed padded layout (padded rows have
        inv_deg == 1, so they stay exactly zero)."""
        inv = self._inv_lanes(arrays["inv_deg"], xp)
        return (self._padded_core(arrays, xp) * inv).astype(xp.dtype)

    def mean(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.mean_apply(self.arrays, x)

    def apply(self, arrays, x: jnp.ndarray) -> jnp.ndarray:
        """Jit-friendly form: plan arrays as traced arguments."""
        if "inv_sqrt_deg" in arrays:
            inv = arrays["inv_sqrt_deg"][:, None]
            xs = (x * inv).astype(x.dtype)
            return (self._fn(arrays["f"], arrays["b"], xs) * inv).astype(x.dtype)
        return self._fn(arrays["f"], arrays["b"], x)

    def gcn_apply(self, arrays, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Fused GCN layer core A (x w) with the fused backward (one
        kernel computes (A dZ) w^T and A dZ).  Falls back to the unfused
        composition in normalized mode."""
        if "inv_sqrt_deg" in arrays:
            return self.apply(arrays, jnp.dot(
                x, w, preferred_element_type=jnp.float32).astype(x.dtype))
        return self._fused["gcn"](arrays["f"], arrays["b"], x, w)

    def gin_apply(self, arrays, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Fused GIN layer core (A x) w (fused forward keeps the aggregate
        in VMEM; it is also the saved residual for dW)."""
        if "inv_sqrt_deg" in arrays:
            agg = self.apply(arrays, x)
            return jnp.dot(agg, w, preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        return self._fused["gin"](arrays["f"], arrays["b"], x, w)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Convenience form.  Inside a caller's jit, ``self.arrays`` become
        # module constants — fine for small graphs and tests; for large
        # graphs use ``apply`` with ``arrays`` threaded as a jit argument.
        return self.apply(self.arrays, x)


def spmm_reference_dense(row_pointers, column_index, num_nodes, x):
    """NumPy dense oracle ``A @ X`` for tests (binary, unweighted sum)."""
    a = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    rp = np.asarray(row_pointers)
    ci = np.asarray(column_index)
    for r in range(num_nodes):
        a[r, ci[rp[r]: rp[r + 1]]] = 1.0
    return a @ np.asarray(x, dtype=np.float64)
