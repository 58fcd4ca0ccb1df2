#!/usr/bin/env python
"""LOA ablation on hardware (VERDICT r3 next #7; reference Fig. 14 /
report SSVI-C3: LOA gains avg +8.4%, max +36.3% on the GPU).

LOA's objective (regroup rows so windows have fewer unique columns,
LOI.cpp:660-805) targets the DENSE-BUCKET population's gather cost, so
the honest ablation runs the reference-like two-population regime
(band_mode='never': dense buckets + ELL + residual) with reorder in
{none, loa, cluster} interleaved in ONE process, plus the production
band+spill configuration for context (where cluster/rcm win and LOA is
NOT used — it inflates band extents, artifacts/standin_fidelity.jsonl).

Env: LOA_GRAPHS (default 'DD@1.0,AZ@0.5,RD@0.25'), LOA_DIM (32),
LOA_ROUNDS (3).  Emits JSONL; redirect to artifacts/loa_ablation.jsonl.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()
    dim = int(_os.environ.get("LOA_DIM", 32))
    rounds = int(_os.environ.get("LOA_ROUNDS", 3))
    graphs = _os.environ.get("LOA_GRAPHS", "DD@1.0,AZ@0.5,RD@0.25")

    for spec in graphs.split(","):
        key, _, sc = spec.partition("@")
        scale = float(sc) if sc else 1.0
        src, dst, nn, _ = io.reference_standin(key, seed=7, scale=scale)
        rp0, ci0 = io.to_csr(src, dst, nn)
        nnz = int(rp0[-1])
        x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                        .astype(np.float32)).astype(jnp.bfloat16)

        variants = {}
        for name in ("none", "loa", "cluster"):
            t0 = time.perf_counter()
            if name == "none":
                rp, ci = rp0, ci0
            else:
                fn = ro.loa_reorder if name == "loa" else ro.cluster_reorder
                perm = fn(rp0, ci0, nn)
                rp, ci = ro.apply_permutation(rp0, ci0, nn, perm)
            reo_s = time.perf_counter() - t0
            # reference-like two-population regime: LOA's home turf
            op = HybridSpMM(rp, ci, nn, PlanConfig(
                compute_dtype="bfloat16", impl="pallas",
                band_mode="never", loi_mode="calibrated"))
            variants[name] = (op, reo_s)

        # production band+spill context on the best-known reorder
        op_band, _ = variants["cluster"]
        rp, ci = None, None

        for rnd in range(rounds):
            row = {"graph": key, "scale": scale, "nnz": nnz, "dim": dim,
                   "round": rnd, "regime": "dense_bucket"}
            for name, (op, reo_s) in variants.items():
                class _W:
                    arrays = op.arrays

                    @staticmethod
                    def apply(a, v, _op=op):
                        return _op.apply(a, v)

                dt = chained_apply_time(_W, x, k1=2, k2=10, trials=3)
                row[name + "_us"] = round(dt * 1e6, 1)
                row[name + "_reorder_s"] = round(reo_s, 1)
            base = row["none_us"]
            for name in ("loa", "cluster"):
                row[name + "_gain_pct"] = round(
                    100 * (1 - row[name + "_us"] / max(base, 1e-9)), 1)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
