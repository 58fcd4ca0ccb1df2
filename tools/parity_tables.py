#!/usr/bin/env python
"""Reference parity tables (VERDICT r2 missing #3 / next #6).

One script generates every comparison row against the reference's
published numbers (BASELINE.md; report Tables XVI and VIII/IX):

- SpMM kernel time per Table XVI row, measured at dim=32 — the
  reference's SAG benchmark runs `forward_fixed32` (GNN_model.py:251-262,
  HC-SpMM_main.py:56-64), so Table XVI's µs are dim-32 numbers.
- GCN / GIN epoch fwd+bwd per Tables VIII/IX at the reference driver's
  default topology (HC-SpMM_main.py:19-25: 6 layers, hidden=32,
  classes=22, dim = Table II feature dim; GIN per BASELINE.json: 5
  layers hidden=64).

Graphs are the calibrated DC-SBM stand-ins (graphs/io.py REFERENCE_GRAPHS
+ STANDIN_STRUCTURE; Dataset.zip is a missing blob and this rig has no
egress).  Large graphs run at --scale and compare by nnz/s, which is
scale-free for the kernel; epoch rows at reduced scale are labeled and
the ratio column compares ms *per nnz*.

Emits JSONL rows to stdout (redirect to artifacts/parity_r3.jsonl) and
rewrites the generated section of docs/PARITY.md when --write-doc is
passed.  NO hand-copied numbers: the doc table is produced from the same
records.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

# Reference absolute numbers (BASELINE.md).  Table XVI: HC-SpMM SpMM µs
# on RTX 3090; Tables VIII/IX: GCN/GIN avg epoch fwd/bwd ms on RTX 3090.
REF_SPMM_US = {
    "CS": 5.25, "CR": 6.05, "PM": 11.62, "PT": 17.76, "DD": 121.57,
    "AZ": 240.67, "YS": 581.41, "OC": 624.58, "GH": 568.41,
    "YH": 1045.92, "RD": 1574.69, "TT": 1382.53, "DP": 16718.30,
}
REF_GCN_MS = {  # (fwd, bwd)
    "CS": (0.31, 0.45), "CR": (0.26, 0.36), "PM": (0.28, 0.43),
    "PT": (0.32, 0.42), "DD": (2.17, 2.09), "AZ": (3.41, 3.82),
    "YS": (10.12, 9.24), "OC": (10.98, 10.12), "GH": (7.88, 8.30),
    "YH": (18.74, 16.82), "RD": (25.30, 26.46), "TT": (20.46, 21.94),
}
REF_GIN_MS = {  # (fwd, bwd) — Table IX covers the molecule/social rows
    "YS": (8.16, 13.26), "OC": (8.92, 14.65), "YH": (15.11, 24.14),
    "RD": (21.49, 39.27), "TT": (20.15, 32.92),
}
# stand-in scale per graph: round 4 runs everything that fits one chip
# at FULL scale (VERDICT r3 next #3); only DP (172M edges / 18M nodes)
# stays scaled.
SCALE = {
    "CS": 1.0, "CR": 1.0, "PM": 1.0, "PT": 1.0, "DD": 1.0, "AZ": 1.0,
    "YS": 1.0, "OC": 1.0, "GH": 1.0, "YH": 1.0, "RD": 1.0,
    "TT": 1.0, "DP": 0.05,
}
# preferred reorder per structure class (round-3 measured: cluster for
# the DC-SBM stand-ins — RCM dies at even 2% mixing, see
# format.reorder.cluster_reorder).  The XVI sweep ALWAYS measures both
# rcm and cluster (this table only orders them) and records the winner,
# which the epoch rows then reuse.
REORDER = {
    "CS": "rcm", "CR": "rcm", "PM": "rcm", "PT": "rcm", "DD": "cluster",
    "AZ": "cluster", "YS": "cluster", "OC": "cluster", "GH": "cluster",
    "YH": "cluster", "RD": "cluster", "TT": "cluster", "DP": "cluster",
}


def _graph(key, scale, seed=7, mode=None):
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro

    src, dst, nn, dim = io.reference_standin(key, seed=seed, scale=scale)
    rp, ci = io.to_csr(src, dst, nn)
    mode = mode or REORDER[key]
    t0 = time.perf_counter()
    perm = {"rcm": _ro.rcm_reorder, "cluster": _ro.cluster_reorder}[mode](
        rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    return rp, ci, nn, dim, time.perf_counter() - t0


# best (band_impl, reorder) found by the XVI sweep, consumed by the
# epoch rows (filled at runtime)
WINNER: dict = {}


def _measure_variant(rp, ci, nn, dim, band_impl, rounds):
    import jax.numpy as jnp

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time

    t0 = time.perf_counter()
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl=band_impl,
        loi_mode="calibrated"))
    prep_s = time.perf_counter() - t0
    # edge-closure guard (round 5): every nnz must be owned by exactly
    # one population — the tband dense-routing bug dropped edges and
    # would have recorded a flattering (wrong) time had its candidate
    # not errored out.  Free host check; fail loud.
    p = op.plan
    owned = (p.band_nnz + p.dense_nnz + p.sparse_nnz
             + getattr(p, "spill_nnz", 0))
    assert owned == int(rp[-1]), (
        f"plan drops edges: owned {owned} != nnz {int(rp[-1])} "
        f"(band {p.band_nnz} dense {p.dense_nnz} sparse {p.sparse_nnz} "
        f"spill {getattr(p, 'spill_nnz', 0)})")
    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    class _P:
        def __init__(self, o):
            self.op, self.arrays = o, o.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    xp = op.pad_input(x)
    # tiny graphs underflow the 8-apply differencing chain (CS measured
    # 0.0 us); scale the chain so each measurement covers >= ~1 ms work
    import jax

    nnz = int(rp[-1])
    kd = int(min(256, max(8, 4_000_000 // max(nnz, 1))))
    ts = sorted(chained_apply_time(_P(op), xp, k1=2, k2=2 + kd, trials=3)
                for _ in range(rounds))
    # device oracle spot-check on small graphs (the single apply_padded
    # call compiles a second executable, so keep it off the big rows
    # where that costs tens of tunnel-seconds)
    if nnz <= 200_000:
        import scipy.sparse as sp

        out = op.unpad_output(op.apply_padded(op.arrays, xp), d=dim,
                              dtype=jnp.float32)
        a = sp.csr_matrix((np.ones(nnz, np.float32), np.asarray(ci),
                           np.asarray(rp)), shape=(nn, nn))
        ref = a @ np.asarray(x, np.float32)
        err = float(np.abs(np.asarray(out) - ref).max()
                    / max(np.abs(ref).max(), 1e-9))
        assert err < 3e-2, f"oracle mismatch: rel err {err}"
    return ts, prep_s, op.plan


def spmm_row(key, scale, dim=32, rounds=3):
    """Table XVI row at the reference SAG shape (dim 32, the
    forward_fixed32 kernel).  Measures the candidate (layout, reorder)
    pairs — tband is the dim-32 fast path; reorder choice is
    structure-dependent — and reports the best, recording every
    candidate's numbers (the reference likewise benchmarks its best
    LOA layout, report SSVI-C3)."""
    from hcspmm_tpu.graphs.io import REFERENCE_GRAPHS

    reorders = list(dict.fromkeys([REORDER[key], "cluster", "rcm"]))
    cands = []
    for mode in reorders:
        rp, ci, nn, _, reo_s = _graph(key, scale, mode=mode)
        nnz = int(rp[-1])
        for impl in ("tband", "wide"):
            try:
                ts, prep_s, plan = _measure_variant(
                    rp, ci, nn, dim, impl, max(rounds - 1, 2))
            except Exception as e:
                print(json.dumps({"table": "XVI-cand-error", "graph": key,
                                  "impl": impl, "reorder": mode,
                                  "error": f"{type(e).__name__}: {e}"}),
                      file=_sys.stderr, flush=True)
                continue
            med = ts[len(ts) // 2]
            cands.append(dict(
                impl=impl, reorder=mode, med=med, ts=ts, prep_s=prep_s,
                reo_s=reo_s, nn=nn, nnz=nnz,
                band_frac=plan.band_nnz / max(nnz, 1),
                spill_frac=getattr(plan, "spill_nnz", 0) / max(nnz, 1),
                widths=list(plan.band_widths)))
            print(json.dumps({"table": "XVI-cand", "graph": key,
                              "impl": impl, "reorder": mode,
                              "us": [round(t * 1e6, 1) for t in ts]}),
                  file=_sys.stderr, flush=True)
    if not cands:
        raise RuntimeError(f"every candidate failed for {key}")
    best = min(cands, key=lambda c: c["med"])
    WINNER[key] = (best["impl"], best["reorder"])
    med, nnz, nn = best["med"], best["nnz"], best["nn"]
    g = REFERENCE_GRAPHS[key]
    ref_gnnz = g["num_edges"] / REF_SPMM_US[key] / 1e3
    our_gnnz = nnz / med / 1e9
    return {
        "table": "XVI", "graph": key, "scale": scale, "dim": dim,
        "nodes": nn, "nnz": nnz, "spmm_us": round(med * 1e6, 2),
        "all_us": [round(t * 1e6, 1) for t in best["ts"]],
        "band_impl": best["impl"], "reorder": best["reorder"],
        "band_widths": best["widths"],
        "gnnz_s": round(our_gnnz, 4),
        "ref_us_3090": REF_SPMM_US[key],
        "ref_gnnz_s": round(ref_gnnz, 4),
        "ratio_vs_ref": round(our_gnnz / ref_gnnz, 4),
        "prep_s": round(best["prep_s"], 2),
        "reorder_s": round(best["reo_s"], 2),
        "band_frac": round(best["band_frac"], 3),
        "spill_frac": round(best["spill_frac"], 3),
    }


def epoch_row(key, scale, model):
    from tools.bench_train import run_config  # same-process measurement

    dimtbl = {"CS": 3703, "CR": 1433, "PM": 500, "PT": 29, "DD": 89,
              "AZ": 96, "YS": 74, "OC": 66, "GH": 64, "YH": 75,
              "RD": 96, "TT": 96}
    ref = (REF_GCN_MS if model == "gcn" else REF_GIN_MS).get(key)
    if ref is None:
        return None
    layers, hidden = (6, 32) if model == "gcn" else (5, 64)
    # reuse the XVI sweep's winning (layout, reorder); hidden <= 64 puts
    # every hot layer in the tband regime
    impl_w, reorder_w = WINNER.get(key, ("tband", REORDER[key]))
    rec = run_config(
        f"parity_{model}_{key}", model, layers, hidden,
        min(dimtbl[key], 512), 22, 0, 0, 0, "pallas", "bfloat16", "auto",
        reorder_w, graph=f"standin:{key}@{scale}",
        band_impl=impl_w, loi_mode="calibrated")
    from hcspmm_tpu.graphs.io import REFERENCE_GRAPHS

    e_full = REFERENCE_GRAPHS[key]["num_edges"]
    ref_total = ref[0] + ref[1]
    # per-nnz comparison (stand-ins at scale<1 have ~scale*nnz)
    our_ms_per_mnnz = rec["epoch_ms"] / (rec["nnz"] / 1e6)
    ref_ms_per_mnnz = ref_total / (e_full / 1e6)
    return {
        "table": "VIII" if model == "gcn" else "IX", "graph": key,
        "scale": scale, "model": model, "layers": layers, "hidden": hidden,
        "dim": rec["dim"], "nnz": rec["nnz"],
        "fwd_ms": rec["fwd_ms"], "bwd_ms": rec["bwd_ms"],
        "epoch_ms": rec["epoch_ms"],
        "ref_fwd_ms_3090": ref[0], "ref_bwd_ms_3090": ref[1],
        "ms_per_mnnz": round(our_ms_per_mnnz, 3),
        "ref_ms_per_mnnz": round(ref_ms_per_mnnz, 3),
        "ratio_vs_ref": round(ref_ms_per_mnnz / our_ms_per_mnnz, 4),
    }


def write_doc(rows, path="docs/PARITY.md"):
    start = "<!-- parity-tables:begin (generated by tools/parity_tables.py) -->"
    end = "<!-- parity-tables:end -->"
    lines = [start, "",
             "### Table XVI parity (SpMM µs, dim 32 — the reference SAG "
             "shape; stand-in graphs, v5e vs RTX 3090, ratio = nnz/s "
             "ours / reference)", "",
             "| graph | scale | nnz | ours µs | ours Gnnz/s | ref µs "
             "(3090) | ref Gnnz/s | ratio |", "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        if r.get("table") != "XVI":
            continue
        lines.append(
            f"| {r['graph']} | {r['scale']} | {r['nnz']:,} | "
            f"{r['spmm_us']:.1f} | {r['gnnz_s']:.3f} | "
            f"{r['ref_us_3090']:.2f} | {r['ref_gnnz_s']:.3f} | "
            f"{r['ratio_vs_ref']:.3f} |")
    lines += ["", "### Tables VIII/IX parity (epoch ms; ratio = ms/Mnnz "
              "reference / ours, >1 means we are faster per edge)", "",
              "| graph | model | scale | fwd ms | bwd ms | ref fwd | "
              "ref bwd | ratio |", "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        if r.get("table") not in ("VIII", "IX"):
            continue
        lines.append(
            f"| {r['graph']} | {r['model']} | {r['scale']} | "
            f"{r['fwd_ms']:.2f} | {r['bwd_ms']:.2f} | "
            f"{r['ref_fwd_ms_3090']:.2f} | {r['ref_bwd_ms_3090']:.2f} | "
            f"{r['ratio_vs_ref']:.3f} |")
    lines += ["", end]
    doc = open(path).read()
    if start in doc:
        pre = doc.split(start)[0]
        post = doc.split(end)[1]
        doc = pre + "\n".join(lines) + post
    else:
        doc = doc.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    open(path, "w").write(doc)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graphs", type=str,
                   default="CS,CR,PM,PT,DD,AZ,YS,OC,GH,YH,RD,TT,DP")
    p.add_argument("--epochs-for", type=str, default="DD,AZ,YS,RD")
    p.add_argument("--spmm", action="store_true", default=True)
    p.add_argument("--no-spmm", dest="spmm", action="store_false")
    p.add_argument("--epochs", action="store_true", default=True)
    p.add_argument("--no-epochs", dest="epochs", action="store_false")
    p.add_argument("--write-doc", action="store_true")
    p.add_argument("--from-jsonl", type=str, default="",
                   help="regenerate the doc from an existing artifact")
    args = p.parse_args()

    if args.from_jsonl:
        rows = [json.loads(l) for l in open(args.from_jsonl)
                if l.strip() and "table" in l]
        write_doc(rows)
        return 0

    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()
    rows = []
    if args.spmm:
        for key in args.graphs.split(","):
            key = key.strip().upper()
            try:
                r = spmm_row(key, SCALE[key])
            except Exception as e:  # record the failure, keep the sweep
                r = {"table": "XVI-error", "graph": key,
                     "error": f"{type(e).__name__}: {e}"}
            rows.append(r)
            print(json.dumps(r), flush=True)
    if args.epochs:
        for key in args.epochs_for.split(","):
            key = key.strip().upper()
            for model in ("gcn", "gin"):
                try:
                    r = epoch_row(key, SCALE[key], model)
                except Exception as e:
                    r = {"table": "epoch-error", "graph": key,
                         "model": model,
                         "error": f"{type(e).__name__}: {e}"}
                if r:
                    rows.append(r)
                    print(json.dumps(r), flush=True)
    if args.write_doc:
        write_doc(rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
