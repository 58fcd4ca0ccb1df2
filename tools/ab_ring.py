#!/usr/bin/env python
"""A/B: band_impl wide vs ring on the DD-scale headline graph, one process.

Interleaves the drift-robust chained timer across the two ops so both see
the same chip/tunnel state (verify-skill rule: never compare variants from
separate processes).  Prints one JSON line per variant plus a summary.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--graph", type=str, default="blocks")
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

    if args.graph == "blocks":
        src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, 300,
                                           seed=7)
    else:
        src, dst, nn = io.synthetic_powerlaw(args.nodes, args.degree, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])

    ops = {}
    for impl in ("wide", "ring"):
        ops[impl] = HybridSpMM(rp, ci, nn, PlanConfig(
            loi_mode="intended", compute_dtype="bfloat16", impl="pallas",
            band_h=256, band_impl=impl))
        pl_ = ops[impl].plan
        print(f"{impl}: widths={pl_.band_widths} spill={pl_.spill_nnz} "
              f"supers={[len(s) for s in pl_.band_sw_ids]}",
              file=_sys.stderr)

    x = jnp.asarray(np.random.RandomState(0).randn(nn, args.dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    class _P:
        def __init__(self, op):
            self.op = op
            self.arrays = op.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    wraps = {k: (_P(op), op.pad_input(x)) for k, op in ops.items()}
    # interleave rounds: each round times both variants back to back
    times = {k: [] for k in wraps}
    for r in range(args.rounds):
        for k, (w, xp) in wraps.items():
            dur = chained_apply_time(w, xp, k1=4, k2=4 + args.k, trials=3)
            times[k].append(dur)
    out = {}
    for k, v in times.items():
        v = sorted(v)
        med = v[len(v) // 2]
        out[k] = med
        print(json.dumps({
            "ab": "ring_vs_wide", "variant": k, "graph": args.graph,
            "spmm_us": round(med * 1e6, 2), "dim": args.dim, "nnz": nnz,
            "all_us": [round(t * 1e6, 1) for t in times[k]],
            "gnnz_s": round(nnz / med / 1e9, 3),
        }))
    print(json.dumps({"ab": "ring_vs_wide", "summary": True,
                      "ring_over_wide": round(out["ring"] / out["wide"], 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
