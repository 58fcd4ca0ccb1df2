#!/usr/bin/env python
"""Spill-fraction structural analysis (VERDICT r3 next #4).

Host-side, measured-constant evaluation of the two proposed spill-cutting
mechanisms on the RD/TT stand-ins:

1. **Hub-first dense routing** — route high-unique windows to the MXU
   dense-bucket population.  Quantifies why the three-way router never
   picks it: per-window uncovered-edge counts (the spill a bucket would
   absorb) versus the bucket's own padded gather rows.
2. **All-dense (reference-like) regime with LOA** — models the total
   gather cost if every window ran the dense-bucket path, with and
   without LOA/cluster reordering (the reference's Fig. 14 mechanism).

Emits JSONL to stdout; redirect to artifacts/spill_routing_r4.jsonl.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main() -> int:
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as ro
    from hcspmm_tpu.format.windows import analyze_windows
    from hcspmm_tpu.format.plan import build_plan
    from hcspmm_tpu.config import PlanConfig

    widths = np.array([32, 64, 96, 128, 192, 256])

    def kpad(u):
        i = np.minimum(np.searchsorted(widths, u), len(widths) - 1)
        return np.where(u <= 256, widths[i], u)

    g_ns = 4.0  # measured XLA take ns/row (artifacts/round2_hw.jsonl)
    spill_ns = 5.0  # measured bstream ns/edge upper range (round 3)

    graphs = _os.environ.get("SR_GRAPHS", "RD@0.25,TT@0.25").split(",")
    for spec in graphs:
        key, _, sc = spec.partition("@")
        scale = float(sc) if sc else 1.0
        src, dst, nn, _ = io.reference_standin(key, seed=7, scale=scale)
        rp, ci = io.to_csr(src, dst, nn)
        nnz = int(rp[-1])
        rec = {"graph": key, "scale": scale, "nodes": nn, "nnz": nnz}

        # current production shape (cluster + band+spill)
        perm = ro.cluster_reorder(rp, ci, nn)
        rp_c, ci_c = ro.apply_permutation(rp, ci, nn, perm)
        plan = build_plan(rp_c, ci_c, nn, PlanConfig(
            compute_dtype="bfloat16", impl="pallas"))
        rec["band_frac"] = round(plan.band_nnz / nnz, 3)
        rec["spill_frac"] = round(plan.spill_nnz / nnz, 3)
        rec["band_widths"] = list(plan.band_widths)
        rec["spill_model_ms"] = round(plan.spill_nnz * spill_ns / 1e6, 2)

        # mechanism 1: why dense routing has no purchase — per-window
        # edges vs bucket gather rows
        wa = analyze_windows(rp_c, ci_c, nn, window_h=16)
        ne = wa.edge_counts > 0
        rec["mean_edges_per_window"] = round(float(
            wa.edge_counts[ne].mean()), 1)
        rec["mean_unique_per_window"] = round(float(
            wa.unique_counts[ne].mean()), 1)
        rec["windows_where_edges_exceed_kpad_frac"] = round(float(
            (wa.edge_counts[ne]
             > kpad(wa.unique_counts[ne].astype(np.int64))).mean()), 3)

        # mechanism 2: all-dense regime, per reorder (LOA = reference
        # Fig. 14 mechanism; gather model = sum kpad * take rate)
        for name, fn in [("none", None), ("cluster", None),
                         ("loa", ro.loa_reorder)]:
            t0 = time.perf_counter()
            if name == "none":
                rp2, ci2 = rp, ci
            elif name == "cluster":
                rp2, ci2 = rp_c, ci_c
            else:
                p2 = fn(rp, ci, nn)
                rp2, ci2 = ro.apply_permutation(rp, ci, nn, p2)
            reo_s = time.perf_counter() - t0
            w2 = analyze_windows(rp2, ci2, nn, window_h=16)
            kp = kpad(w2.unique_counts.astype(np.int64))
            dense_ms = float((kp * (w2.edge_counts > 0)).sum()) * g_ns / 1e6
            rec[f"all_dense_gather_ms_{name}"] = round(dense_ms, 2)
            rec[f"intensity_{name}"] = round(
                nnz / max(float(kp[w2.edge_counts > 0].sum()), 1), 3)
            if name == "loa":
                rec["loa_reorder_s"] = round(reo_s, 1)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
