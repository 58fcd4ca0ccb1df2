#!/usr/bin/env python
"""Hardware sweep: explicit band width ladder x spill impl on one graph.

One process, interleaved chained timing (drift-robust).  Used to fit the
plan cost model's band-vs-spill constants on the power-law regime
(docs/ROADMAP.md round 3).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", type=str, default="standin:RD@0.25")
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--widths", type=str, default="none,256,512,1024,2048")
    p.add_argument("--spill", type=str, default="dstream")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--k", type=int, default=6)
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
    print(f"graph={args.graph} nodes={nn} nnz={nnz} dim={dim}",
          file=_sys.stderr)

    ops = {}
    for wtok in args.widths.split(","):
        kw = {}
        if wtok == "none":
            kw["band_mode"] = "never"
        elif wtok == "auto":
            pass
        else:
            kw["band_widths"] = (int(wtok),)
        try:
            ops[wtok] = HybridSpMM(rp, ci, nn, PlanConfig(
                loi_mode="intended", compute_dtype="bfloat16",
                impl="pallas", band_h=256, spill_impl=args.spill, **kw))
            pl_ = ops[wtok].plan
            print(f"W={wtok}: widths={pl_.band_widths} "
                  f"supers={[len(s) for s in pl_.band_sw_ids]} "
                  f"band={pl_.band_nnz} spill={pl_.spill_nnz} "
                  f"dense={pl_.dense_nnz} sparse={pl_.sparse_nnz} "
                  f"ds={'y' if pl_.ds_blk is not None else 'n'}",
                  file=_sys.stderr)
        except Exception as e:
            print(f"W={wtok}: BUILD FAIL {e}", file=_sys.stderr)

    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    class _P:
        def __init__(self, op):
            self.op = op
            self.arrays = op.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    wraps = {}
    for k, op in ops.items():
        if getattr(op, "supports_padded", False):
            wraps[k] = (_P(op), op.pad_input(x))
        else:
            print(f"W={k}: no padded support, timing rows layout",
                  file=_sys.stderr)
            wraps[k] = (op, x)
    times = {k: [] for k in wraps}
    for r in range(args.rounds):
        for k, (w, xp) in wraps.items():
            dur = chained_apply_time(w, xp, k1=2, k2=2 + args.k, trials=3)
            times[k].append(dur)
    for k, v in times.items():
        v = sorted(v)
        med = v[len(v) // 2]
        print(json.dumps({
            "sweep": "width", "graph": args.graph, "width": k,
            "spill_impl": args.spill, "spmm_us": round(med * 1e6, 2),
            "dim": dim, "nnz": nnz, "spill_nnz": ops[k].plan.spill_nnz,
            "band_nnz": ops[k].plan.band_nnz,
            "all_us": [round(t * 1e6, 1) for t in times[k]],
            "gnnz_s": round(nnz / med / 1e9, 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
