#!/usr/bin/env python
"""Summarize the hardware campaign (artifacts/round2_hw.jsonl) into the
README/ROADMAP tables: SpMM configs vs the reference baselines, the
fwd/bwd epoch split vs report Tables VIII/IX, spill-formulation A/B
ranking, and the probe rates that drive the cost-model constants.

Usage: python tools/analyze_campaign.py [artifacts/round2_hw.jsonl]
Prints markdown to stdout; safe to re-run as records accumulate.
"""

from __future__ import annotations

import json
import sys

# reference anchors (BASELINE.md)
REF_SPMM_US = {  # Table XVI, RTX 3090
    "DD": 121.57, "AZ": 240.67, "RD": 1574.69, "TT": 1382.53,
}
REF_NNZ = {"DD": 1_686_092, "AZ": 3_356_824, "RD": 10_149_830,
           "TT": 22_011_034}
REF_EPOCH_MS = {  # Tables VIII/IX (fwd, bwd)
    ("gcn", "DD"): (2.17, 2.09), ("gcn", "RD"): (25.30, 26.46),
    ("gcn", "TT"): (20.46, 21.94), ("gin", "RD"): (21.49, 39.27),
    ("gin", "TT"): (20.15, 32.92),
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/round2_hw.jsonl"
    recs = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        recs.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except FileNotFoundError:
        print(f"no campaign file at {path}")
        return 1

    bench = [r for r in recs if "campaign" in r and "value" in r]
    errors = [r for r in recs if "error" in r]
    train = [r for r in recs if "config" in r and "epoch_ms" in r]
    spill = [r for r in recs if "variant" in r]
    probes = [r for r in recs if "probe" in r]

    if bench:
        print("## SpMM configs (Gnnz/s per chip; vs_baseline = reference "
              "DD-derived 13.87 unless noted)\n")
        print("| campaign | Gnnz/s | vs_baseline |")
        print("|---|---|---|")
        for r in bench:
            print(f"| {r['campaign']} | {r.get('value')} "
                  f"| {r.get('vs_baseline')} |")
        print()

    if train:
        print("## Training epoch split vs reference Tables VIII/IX\n")
        print("| config | graph | fwd ms | bwd ms | ref fwd | ref bwd "
              "| fwd ratio |")
        print("|---|---|---|---|---|---|---|")
        for r in train:
            model = r.get("model", "?")
            g = r.get("graph", "")
            key = next((k for k in REF_EPOCH_MS
                        if k[0] == model and k[1] in g.upper()), None)
            # DD-scale synthetic runs count as the DD row
            if key is None and r.get("nodes", 0) > 300_000:
                key = (model, "DD") if (model, "DD") in REF_EPOCH_MS else None
            rf, rb = REF_EPOCH_MS.get(key, (None, None))
            ratio = (round(rf / r["fwd_ms"], 3)
                     if rf and r.get("fwd_ms") else "")
            print(f"| {r['config']} | {g} | {r.get('fwd_ms')} "
                  f"| {r.get('bwd_ms')} | {rf or ''} | {rb or ''} "
                  f"| {ratio} |")
        print()

    if spill:
        print("## Spill formulation A/B (ns/edge, lower wins)\n")
        by_graph: dict = {}
        for r in spill:
            by_graph.setdefault(r.get("graph", "?"), []).append(r)
        for g, rs in by_graph.items():
            rs.sort(key=lambda r: r.get("ns_per_edge", 1e9))
            print(f"**{g}** (spill={rs[0].get('nnz_spill')}): " + ", ".join(
                f"{r['variant']}={r.get('ns_per_edge')}" for r in rs))
        print()

    if probes:
        print("## Primitive probes\n")
        for r in probes:
            if "error" in r:
                print(f"- {r['probe']}: ERROR {r['error'][:120]}")
            else:
                extra = {k: v for k, v in r.items()
                         if k not in ("probe", "us")}
                print(f"- {r['probe']}: {extra}")
        print()

    if errors:
        print("## Failed steps\n")
        for r in errors:
            print(f"- {r.get('campaign', r.get('probe', '?'))}: "
                  f"{r['error'][:160]}")
    print(f"\n({len(recs)} records: {len(bench)} bench, {len(train)} train, "
          f"{len(spill)} spill A/B, {len(probes)} probes, "
          f"{len(errors)} errors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
