#!/usr/bin/env python
"""LOI dense-window threshold ablation (BASELINE.json config #4).

Sweeps the logistic selector's bias (the decision threshold of report
§IV-C) and measures how window routing and single-kernel SpMM time move.
Banding is disabled so the LOI dense/sparse split is what's ablated (the
banded path would otherwise swallow every window on reordered graphs —
itself a finding: on TPU the LOI crossover matters only for graphs the
band path rejects).

Emits one JSONL record per threshold.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=65536)
    p.add_argument("--degree", type=float, default=8.0)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--span", type=int, default=16)
    p.add_argument("--biases", type=str,
                   default="-12,-6,-3.149,-1.5,0,3,1000")
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from hcspmm_tpu.config import LOICoefficients, PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()

    # locality mix gives windows a density spectrum for the threshold to
    # cut through (pure-random graphs route everything one way)
    src, dst, nn = io.synthetic_graph(args.nodes, args.degree, seed=7,
                                      span=args.span, locality=0.7)
    rp, ci = io.to_csr(src, dst, nn)
    nnz = int(rp[-1])
    x = jnp.asarray(
        np.random.RandomState(0).randn(nn, args.dim).astype(np.float32)
    ).astype(args.dtype)

    # lift the hard size cap to the widest MXU bucket so the logistic
    # bias (the ablated threshold) is what decides routing — with the
    # reference's max_cols=32 every window here exceeds the cap and the
    # sweep is flat
    base = dataclasses.replace(LOICoefficients(), max_cols=256)
    for bias in (float(b) for b in args.biases.split(",")):
        co = dataclasses.replace(base, bias=bias)
        cfg = PlanConfig(loi_mode="intended", loi=co, impl="pallas",
                        compute_dtype=args.dtype, band_mode="never")
        t0 = time.perf_counter()
        op = HybridSpMM(rp, ci, nn, cfg)
        prep_s = time.perf_counter() - t0
        plan = op.plan
        dur = chained_apply_time(op, x, k1=2, k2=10, trials=3)
        print(json.dumps({
            "bias": bias,
            "spmm_us": round(dur * 1e6, 2),
            "gnnz_per_s": round(nnz / dur / 1e9, 4),
            "dense_windows": plan.num_dense_windows,
            "dense_nnz_frac": round(plan.dense_nnz / max(nnz, 1), 4),
            "sparse_nnz_frac": round(plan.sparse_nnz / max(nnz, 1), 4),
            "prep_s": round(prep_s, 2),
            "nodes": nn, "nnz": nnz, "dim": args.dim,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
