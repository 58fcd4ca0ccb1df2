#!/usr/bin/env python
"""Kernel-fusion ablation — the Table VI analog (VERDICT r4 #4).

The reference's headline integration win is the FUSED single-layer
backward: one kernel computes (A dZ) W^T and A dZ (26.4-32.0%, avg
30.6% over the unfused two-launch form; report Table VI, kernels
hybrid_all_kernel.cu:1639-2065).  The TPU analog
(ops.spmm.make_fused_ops_padded / kernels tband_fused_direct,
spmm_fused_pallas_padded) keeps the aggregate VMEM-resident between the
two dots, saving one full round trip of the aggregate through HBM.

This tool measures, per graph and layout, the single-layer GCN backward
core three ways inside one process (interleaved, chained timer):

  fused    : the production fused path (one Pallas kernel when the plan
             allows: zero-spill single-bucket; else the composed
             fallback the production code uses)
  composed : SpMM then separate dense dot (fusion explicitly bypassed)
  xla      : impl='xla' composition (XLA's own fusion of gather+dot)

Spill-bearing plans compose by design: the fused kernel's VMEM win is
one aggregate round trip (2*M*dt*xbytes — ~0.4 ms at RD/dim32), while a
spill-corrected fused output would re-run the one-hot merge on the
second output (~7 ms at RD) — the composition is the faster integration
there, and the rows below record that delta directly.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def measure(key, scale, dim, hidden, band_impl, mode=None):
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time
    from tools.parity_tables import _graph

    if key == "blocks":
        from hcspmm_tpu.graphs import io as _io
        from hcspmm_tpu.format import reorder as _ro

        src, dst, nn = _io.synthetic_blocks(334928, 5.0, 300, seed=7)
        rp, ci = _io.to_csr(src, dst, nn)
        perm = _ro.rcm_reorder(rp, ci, nn)
        rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    else:
        rp, ci, nn, _, _ = _graph(key, scale, mode=mode)
    nnz = int(rp[-1])
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl=band_impl,
        loi_mode="calibrated"))
    plan = op.plan
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(nn, dim).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(dim, hidden).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    xp = op.pad_input(x)
    tband = getattr(plan, "tband", False)

    # the backward core: dX = (A dZ) W^T with the A dZ residual kept
    # (dW forms from it); g plays dZ in the layer's padded layout
    g = xp  # same shape/layout as a hidden-layer cotangent at dim==hidden

    # build the two cores once (closures over op/plan)
    if tband:
        from hcspmm_tpu.kernels.tband import (spmm_tband_fused_padded,
                                              sublane_pad)
        from hcspmm_tpu.kernels.block_spmm import spmm_pallas_padded
        ht = xp.shape[0]
        wf = jnp.zeros((xp.shape[0], ht), xp.dtype)  # square W-form
        wf = wf.at[:dim, :dim].set(jnp.asarray(
            rng.randn(dim, dim).astype(np.float32) * 0.1).astype(xp.dtype))

        def _fused_run(a, v):
            res = spmm_tband_fused_padded(a["f"], v, wf, plan)
            if res is not None:
                out, agg = res
            else:
                agg = spmm_pallas_padded(a["f"], v, plan, jnp.bfloat16)
                out = jnp.dot(wf, agg.astype(wf.dtype),
                              preferred_element_type=jnp.float32
                              ).astype(v.dtype)
            return out + agg * 1e-30

        def _composed_run(a, v):
            agg = spmm_pallas_padded(a["f"], v, plan, jnp.bfloat16)
            out = jnp.dot(wf, agg.astype(wf.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(v.dtype)
            return out + agg * 1e-30
        fused_available = (spmm_tband_fused_padded(
            op.arrays["f"], xp, wf, plan) is not None)
    else:
        from hcspmm_tpu.kernels.block_spmm import (
            spmm_fused_pallas_padded, spmm_pallas_padded)
        dp = xp.shape[1]
        wp = jnp.zeros((dp, dp), xp.dtype)
        wp = wp.at[:dim, :dim].set(jnp.asarray(
            rng.randn(dim, dim).astype(np.float32) * 0.1).astype(xp.dtype))

        def _fused_run(a, v):
            res = spmm_fused_pallas_padded(a["f"], v, wp, plan)
            if res is not None:
                out, agg = res
            else:
                agg = spmm_pallas_padded(a["f"], v, plan, jnp.bfloat16)
                out = jnp.dot(agg, wp, preferred_element_type=jnp.float32
                              ).astype(v.dtype)
            return out + agg * 1e-30

        def _composed_run(a, v):
            agg = spmm_pallas_padded(a["f"], v, plan, jnp.bfloat16)
            out = jnp.dot(agg, wp, preferred_element_type=jnp.float32
                          ).astype(v.dtype)
            return out + agg * 1e-30
        fused_available = (spmm_fused_pallas_padded(
            op.arrays["f"], xp, wp, plan) is not None)

    def timed(fn):
        class _P:
            arrays = op.arrays
            apply = staticmethod(fn)

        kd = int(min(128, max(8, 4_000_000 // max(nnz, 1))))
        return sorted(chained_apply_time(_P, xp, k1=2, k2=2 + kd,
                                         trials=3) for _ in range(3))

    # interleaved: fused, composed, fused, composed ... medians compared
    t_f1 = timed(_fused_run)
    t_c1 = timed(_composed_run)
    t_f2 = timed(_fused_run)
    t_c2 = timed(_composed_run)
    f_med = sorted(t_f1 + t_f2)[2]
    c_med = sorted(t_c1 + t_c2)[2]
    rec = dict(
        table="VI-analog", graph=key, dim=dim, nnz=nnz,
        band_impl=band_impl, layout=("tband" if tband else "padded"),
        fused_kernel_available=bool(fused_available),
        spill_frac=round(getattr(plan, "spill_nnz", 0) / nnz, 3),
        fused_us=[round(t * 1e6, 1) for t in sorted(t_f1 + t_f2)],
        composed_us=[round(t * 1e6, 1) for t in sorted(t_c1 + t_c2)],
        fused_med_us=round(f_med * 1e6, 1),
        composed_med_us=round(c_med * 1e6, 1),
        gain_pct=round((c_med - f_med) / c_med * 100, 1),
    )
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    from hcspmm_tpu.train.cli import enable_compile_cache
    enable_compile_cache()
    # zero-spill fused-kernel regime (the Table VI shape), both layouts
    measure("blocks", 1.0, 32, 32, "tband")
    measure("blocks", 1.0, 96, 96, "wide")
    # spill-bearing production graphs (composed-by-design; the delta row
    # documents that the fallback costs nothing vs the fused form)
    measure("DD", 1.0, 32, 32, "tband")
    measure("YS", 1.0, 32, 32, "tband")
    measure("RD", 1.0, 32, 32, "tband")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
