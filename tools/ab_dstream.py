#!/usr/bin/env python
"""A/B: spill_impl dstream vs take on power-law graphs, one process.

The round-2 thesis (kernels/dstream.py): the XLA merge — segment_sum +
scatter-add — is ~80% of spill cost; the dst-streamed Pallas one-hot
merge removes it.  This measures it end-to-end on the spill-dominated
configs (VERDICT r2 missing #2).  Drift-robust: interleaved chained
timing of both variants in one process, medians reported.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", type=str, default="powerlaw",
                   help="powerlaw | standin:RD@0.25 | standin:TT@0.25 | ...")
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()

    import jax
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

    ops = {}
    for spill in ("take", "dstream"):
        ops[spill] = HybridSpMM(rp, ci, nn, PlanConfig(
            loi_mode="intended", compute_dtype="bfloat16", impl="pallas",
            band_h=256, spill_impl=spill))
        pl_ = ops[spill].plan
        print(f"{spill}: widths={pl_.band_widths} spill={pl_.spill_nnz} "
              f"band={pl_.band_nnz} ds={'yes' if pl_.ds_blk is not None else 'no'}",
              file=_sys.stderr)

    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    class _P:
        def __init__(self, op):
            self.op = op
            self.arrays = op.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    wraps = {k: (_P(op), op.pad_input(x)) for k, op in ops.items()}
    times = {k: [] for k in wraps}
    for r in range(args.rounds):
        for k, (w, xp) in wraps.items():
            dur = chained_apply_time(w, xp, k1=2, k2=2 + args.k, trials=3)
            times[k].append(dur)
    out = {}
    for k, v in times.items():
        v = sorted(v)
        med = v[len(v) // 2]
        out[k] = med
        print(json.dumps({
            "ab": "dstream_vs_take", "variant": k, "graph": args.graph,
            "spmm_us": round(med * 1e6, 2), "dim": dim, "nnz": nnz,
            "spill_nnz": ops[k].plan.spill_nnz,
            "all_us": [round(t * 1e6, 1) for t in times[k]],
            "gnnz_s": round(nnz / med / 1e9, 3),
        }))
    print(json.dumps({
        "ab": "dstream_vs_take", "summary": True, "graph": args.graph,
        "dstream_over_take": round(out["dstream"] / out["take"], 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
