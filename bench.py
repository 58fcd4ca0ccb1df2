#!/usr/bin/env python
"""Headline benchmark: hybrid SpMM nnz/s per chip.

Runs the single-kernel aggregation benchmark (the reference's SAG profile,
GNN_model.py:251-262 / paper Table XVI) on a DD-scale synthetic graph
(the bundled example dataset is a missing blob in the reference snapshot;
DD: 334,925 nodes / 1,686,092 edges / dim 96, BASELINE.md Table II).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: reference HC-SpMM on DD does 1,686,092 nnz / 121.57 us
= 13.87 Gnnz/s on an RTX 3090 (BASELINE.md Table XVI).

Env knobs: HCSPMM_BENCH_NODES, HCSPMM_BENCH_DEGREE, HCSPMM_BENCH_DIM,
HCSPMM_BENCH_DTYPE (bfloat16|float32), HCSPMM_BENCH_ROUNDS,
HCSPMM_BENCH_MODE (loi mode), HCSPMM_BENCH_IMPL (xla|pallas).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    nodes = int(os.environ.get("HCSPMM_BENCH_NODES", 334_928))
    degree = float(os.environ.get("HCSPMM_BENCH_DEGREE", 5.03))
    dim = int(os.environ.get("HCSPMM_BENCH_DIM", 96))
    dtype = os.environ.get("HCSPMM_BENCH_DTYPE", "bfloat16")
    rounds = int(os.environ.get("HCSPMM_BENCH_ROUNDS", 100))
    mode = os.environ.get("HCSPMM_BENCH_MODE", "intended")
    impl = os.environ.get("HCSPMM_BENCH_IMPL", "xla")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.ops.spmm import HybridSpMM

    t0 = time.perf_counter()
    src, dst, nn = io.synthetic_graph(nodes, degree, seed=7, span=512)
    rp, ci = io.to_csr(src, dst, nn)
    nnz = int(rp[-1])
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    cfg = PlanConfig(loi_mode=mode, compute_dtype=dtype, impl=impl)
    op = HybridSpMM(rp, ci, nn, cfg)
    prep_s = time.perf_counter() - t0

    x = jnp.asarray(
        np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    )
    fn = jax.jit(op)
    out = fn(x)
    out.block_until_ready()  # compile
    for _ in range(3):
        out = fn(x)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(x)
    out.block_until_ready()
    dur = (time.perf_counter() - t0) / rounds

    gnnz = nnz / dur / 1e9
    baseline_gnnz = 13.87  # RTX 3090, DD, BASELINE.md Table XVI
    result = {
        "metric": "spmm_nnz_per_s_per_chip",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / baseline_gnnz, 4),
    }
    # detail record for humans (stderr keeps stdout to the one JSON line)
    print(
        json.dumps(
            {
                "spmm_us": round(dur * 1e6, 2),
                "nnz": nnz,
                "nodes": nn,
                "dim": dim,
                "dtype": dtype,
                "mode": mode,
                "impl": impl,
                "dense_windows": op.plan.num_dense_windows,
                "total_windows": (nn + 15) // 16,
                "prep_s": round(prep_s, 3),
                "graphgen_s": round(gen_s, 3),
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
