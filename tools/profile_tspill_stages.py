#!/usr/bin/env python
"""Per-stage timing of the tband lane spill chain on a stand-in graph.

Stages (kernels/tspill.py wiring in tband._tband_apply_spill):
  mxgather : compact-table build (only when ts_lo present)
  take     : per-edge lane gather feeding the merge chunks
  tbstream : block-wide one-hot merge into the band buffer
  zero     : missing-super zero-fill
  chain    : all of the above as the production path runs them

Usage: python tools/profile_tspill_stages.py YH [reorder]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    key = _sys.argv[1] if len(_sys.argv) > 1 else "YH"
    mode = _sys.argv[2] if len(_sys.argv) > 2 else None

    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.kernels.tspill import (mxgather_lanes, tbstream_merge,
                                           zero_lane_blocks)
    from tools.parity_tables import _graph, SCALE

    enable_compile_cache()
    rp, ci, nn, _, _ = _graph(key, SCALE[key], mode=mode)
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl="tband",
        loi_mode="calibrated"))
    plan, f = op.plan, op.arrays["f"]
    x = jnp.asarray(np.random.RandomState(0).randn(nn, 32)
                    .astype(np.float32)).astype(jnp.bfloat16)
    xp = op.pad_input(x)
    nnz = int(rp[-1])

    def timed(name, fn, per=None):
        class _P:
            arrays = f
            apply = staticmethod(fn)

        ts = sorted(chained_apply_time(_P, xp, k1=2, k2=10, trials=2)
                    for _ in range(3))
        rec = {"stage": name, "us": [round(t * 1e6, 1) for t in ts]}
        if per:
            rec["ns_per"] = round(ts[1] * 1e9 / per, 2)
        print(json.dumps(rec), flush=True)

    has_ts = "ts_lo" in f

    def fold(v, g):
        # fold a result back into the carried array at ~0 weight
        s = g.sum() if g.ndim == 1 else g.sum(axis=tuple(range(1, g.ndim))
                                              ).sum()
        return v.at[:1, :1].add(s.astype(v.dtype) * 1e-30)

    has_ts2 = getattr(plan, "ts2_segs", None) and "ts2_ranks" in f
    if has_ts:
        u = int(plan.ts_lo.shape[0] * plan.ts_rel.shape[2])
        timed("mxgather",
              lambda a, v: fold(v, mxgather_lanes(
                  v, a["ts_lo"], a["ts_rel"], span=plan.ts_span)), u)

        if has_ts2:
            from hcspmm_tpu.kernels.tspill import segmented_gather

            def ap_take(a, v):
                src = mxgather_lanes(v, a["ts_lo"], a["ts_rel"],
                                     span=plan.ts_span)
                return fold(v, segmented_gather(
                    src, a["ts2_ranks"], a["ds_laneg"], plan.ts2_segs,
                    plan.ts2_pieces, bw=a["ds_tlocal"].shape[1]))
        else:
            def ap_take(a, v):
                src = mxgather_lanes(v, a["ts_lo"], a["ts_rel"],
                                     span=plan.ts_span)
                return fold(v, jnp.take(src, a["ds_laneg"], axis=1))
    else:
        def ap_take(a, v):
            return fold(v, jnp.take(v, a["ds_laneg"], axis=1))
    timed("gather+take", ap_take, int(f["ds_laneg"].shape[0]))

    def ap_chain(a, v):
        from hcspmm_tpu.kernels.tband import _tband_apply_spill
        return _tband_apply_spill(v, a, v, plan)
    timed("spill_chain", ap_chain, plan.spill_nnz)

    def ap_tb(a, v):
        g = jnp.zeros((v.shape[0], a["ds_laneg"].shape[0]), v.dtype)
        return tbstream_merge(g, a["ds_tlocal"], a["ds_lblk"], v,
                              group=plan.ds_lgroup)
    timed("tbstream_only", ap_tb, int(f["ds_lblk"].shape[0]))

    mis = f.get("band_missing_sw")
    if mis is not None and mis.shape[0]:
        timed("zero", lambda a, v: zero_lane_blocks(
            v, a["band_missing_sw"], plan.band_h),
            int(mis.shape[0]))
    print(json.dumps({
        "graph": key, "spill_nnz": plan.spill_nnz,
        "laneg": int(f["ds_laneg"].shape[0]),
        "chunks": int(f["ds_lblk"].shape[0]),
        "lgroup": plan.ds_lgroup,
        "ts": has_ts,
        "ts2_segs": (len(plan.ts2_segs) if has_ts2 else 0),
        "ts2_u2": (int(f["ts2_ranks"].shape[0]) if has_ts2 else 0),
        "bw": int(f["ds_tlocal"].shape[1]),
        "ts_chunks": int(f["ts_lo"].shape[0]) if has_ts else 0,
        "missing": int(mis.shape[0]) if mis is not None else 0,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
