#!/usr/bin/env python
"""Interleaved A/B/C of the streamed-merge layouts (ds_kind tile / block
/ take) on one graph — calibrates format.plan's kind cost model."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", type=str, default="standin:TT@0.25")
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--width", type=str, default="auto")
    p.add_argument("--kinds", type=str, default="tile,block,take")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--k", type=int, default=6)
    args = p.parse_args()

    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    dim = args.dim
    if args.graph == "powerlaw":
        src, dst, nn = io.synthetic_powerlaw(args.nodes, args.degree, seed=7)
    elif args.graph.startswith("standin:"):
        key, _, sc = args.graph[len("standin:"):].partition("@")
        src, dst, nn, dim = io.reference_standin(
            key, seed=7, scale=float(sc) if sc else 1.0)
    else:
        src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, 300,
                                           seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.cluster_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])

    kw = {}
    if args.width != "auto":
        kw["band_widths"] = (int(args.width),)
    ops = {}
    for kind in args.kinds.split(","):
        spill = "take" if kind == "take" else "dstream"
        ops[kind] = HybridSpMM(rp, ci, nn, PlanConfig(
            loi_mode="intended", compute_dtype="bfloat16", impl="pallas",
            band_h=256, spill_impl=spill,
            ds_kind=kind if kind != "take" else "auto", **kw))
        pl_ = ops[kind].plan
        print(f"{kind}: widths={pl_.band_widths} spill={pl_.spill_nnz} "
              f"kind={pl_.ds_kind} g={getattr(pl_, 'ds_group', 0)} "
              f"gf32={getattr(pl_, 'ds_gather_f32', False)}",
              file=_sys.stderr)

    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    class _P:
        def __init__(self, op):
            self.op, self.arrays = op, op.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    wraps = {k: (_P(op), op.pad_input(x)) for k, op in ops.items()}
    times = {k: [] for k in wraps}
    for r in range(args.rounds):
        for k, (w, xp) in wraps.items():
            times[k].append(chained_apply_time(w, xp, k1=2, k2=2 + args.k,
                                               trials=3))
    for k, v in times.items():
        v = sorted(v)
        med = v[len(v) // 2]
        print(json.dumps({
            "ab": "ds_kind", "variant": k, "graph": args.graph,
            "width": args.width, "spmm_us": round(med * 1e6, 2),
            "all_us": [round(t * 1e6, 1) for t in v], "nnz": nnz,
            "spill_nnz": ops[k].plan.spill_nnz,
            "gnnz_s": round(nnz / med / 1e9, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
