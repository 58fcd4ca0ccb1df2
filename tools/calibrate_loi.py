#!/usr/bin/env python
"""Refit the LOI selector coefficients from measured TPU timings.

The reference trains its logistic selector on synthetic 16-row matrices
timed on the GPU (report §IV-C); the shipped coefficients are hard-coded
into the kernel (hybrid_all_kernel.cu:261-262).  GPU-fitted coefficients
are meaningless for MXU-vs-VPU, so this tool rebuilds the procedure on
the current backend:

1. sample (unique_cols, nnz) window shapes on a coarse grid;
2. for each shape, build a graph of many identical windows and time the
   dense (width-bucket MXU) path vs the sparse (ELL/VPU) path with the
   in-jit chained timer (bench.py methodology — the axon tunnel makes
   naive per-call timing useless);
3. logistic-fit (format.loi.fit_logistic) and print a PlanConfig snippet.

Usage:  python tools/calibrate_loi.py [--samples 24] [--dim 96]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def window_graph(unique: int, nnz: int, copies: int, window_h: int = 16):
    """CSR of `copies` independent windows, each with `unique` distinct
    neighbour columns and `nnz` edges spread round-robin over rows."""
    rows_edges = [[] for _ in range(window_h)]
    for e in range(nnz):
        rows_edges[e % window_h].append(e % unique)
    rp = [0]
    ci = []
    n = copies * window_h
    for c in range(copies):
        base = c * window_h  # neighbour ids point inside the same window
        for r in range(window_h):
            cols = sorted(set((base + v) % n for v in rows_edges[r]))
            ci.extend(cols)
            rp.append(len(ci))
    return np.asarray(rp, np.int32), np.asarray(ci, np.int32), n


def time_path(rp, ci, n, dim, mode, dtype="bfloat16", coeffs=None):
    import jax.numpy as jnp

    from bench import chained_timer
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM

    extra = {"loi": coeffs} if coeffs is not None else {}
    cfg = PlanConfig(loi_mode=mode, compute_dtype=dtype, impl="pallas",
                     band_mode="never", **extra)
    op = HybridSpMM(rp, ci, n, cfg)
    x = jnp.zeros((n, dim), jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    return chained_timer(op, x, k1=2, k2=10)


def _target_graph(spec: str, seed: int = 7):
    """'standin:KEY[@scale]' | 'powerlaw[:N[:deg]]' -> (rp, ci, n)."""
    from hcspmm_tpu.graphs import io

    if spec.startswith("standin:"):
        key, _, sc = spec[len("standin:"):].partition("@")
        src, dst, n, _ = io.reference_standin(
            key, seed=seed, scale=float(sc) if sc else 1.0)
    elif spec.startswith("powerlaw"):
        parts = spec.split(":")
        n = int(parts[1]) if len(parts) > 1 else 65536
        deg = float(parts[2]) if len(parts) > 2 else 20.0
        src, dst, n = io.synthetic_powerlaw(n, deg, seed=seed)
    else:
        raise ValueError(spec)
    rp, ci = io.to_csr(src, dst, n)
    return rp, ci, n


def calibrate_mixed(args) -> int:
    """Mixture-matched calibration + selector-accuracy validation
    (VERDICT r1 #8; reference procedure report §IV-C, >90% accuracy).

    Windows are NOT timed as a homogeneous universe: the 2-D
    (unique_cols, fill) histogram of the TARGET graph class picks the
    bins, each bin is timed both ways (dense MXU bucket vs sparse
    gather), the logistic fit is weighted by the bin's window count, and
    the fitted selector is scored per-window against the measured
    per-bin oracle.  A final end-to-end run on the real mixed graph
    (calibrated vs all_dense vs all_sparse) captures the cache/bandwidth
    contention between co-scheduled paths that homogeneous timing
    misses."""
    import sys

    from hcspmm_tpu.config import BLK_H, BLK_W
    from hcspmm_tpu.format.loi import (LOICoefficients, decide_hybrid_type,
                                       fit_logistic)
    from hcspmm_tpu.format.windows import analyze_windows
    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()
    rp, ci, n = _target_graph(args.mixed)
    wa = analyze_windows(rp, ci, n)
    ne = wa.edge_counts > 0
    u_all = wa.unique_counts[ne].astype(np.int64)
    e_all = wa.edge_counts[ne].astype(np.int64)
    blocks = (u_all + BLK_W - 1) // BLK_W
    fill_all = e_all / np.maximum(blocks * BLK_H * BLK_W, 1)

    # 2-D histogram bins: geometric in unique, linear in fill
    u_edges = np.unique(np.concatenate([
        [1], np.geomspace(2, max(int(u_all.max()), 2) + 1, 12).astype(int)]))
    f_edges = np.linspace(0.0, float(fill_all.max()) + 1e-9, 7)
    ub = np.clip(np.searchsorted(u_edges, u_all, "right") - 1, 0,
                 len(u_edges) - 2)
    fb = np.clip(np.searchsorted(f_edges, fill_all, "right") - 1, 0,
                 len(f_edges) - 2)
    bin_id = ub * (len(f_edges) - 1) + fb
    uniq_bins, counts = np.unique(bin_id, return_counts=True)
    order = np.argsort(-counts)
    keep, covered = [], 0
    for i in order[: args.max_bins]:
        keep.append(uniq_bins[i])
        covered += counts[i]
    cov_frac = covered / len(u_all)
    print(f"# mixture {args.mixed}: {len(u_all)} windows, "
          f"{len(uniq_bins)} bins, timing top {len(keep)} "
          f"({cov_frac:.1%} of windows)", file=sys.stderr, flush=True)

    feats, labels, weights, bin_oracle = [], [], [], {}
    for b in keep:
        sel = bin_id == b
        u_rep = max(int(np.median(u_all[sel])), 1)
        e_rep = max(int(np.median(e_all[sel])), u_rep)
        copies = max(64, min(args.copies,
                             int(2_000_000 / max(e_rep, 1))))
        rpb, cib, nb = window_graph(u_rep, e_rep, copies)
        td = time_path(rpb, cib, nb, args.dim, "all_dense", args.dtype)
        ts = time_path(rpb, cib, nb, args.dim, "all_sparse", args.dtype)
        blocks_r = (u_rep + BLK_W - 1) // BLK_W
        dens = e_rep / (blocks_r * BLK_H * BLK_W)
        lab = 1.0 if ts < td else 0.0
        bin_oracle[b] = lab
        feats.append([u_rep, dens])
        labels.append(lab)
        weights.append(int(sel.sum()))
        print(f"bin u={u_rep:4d} nnz={e_rep:5d} w={int(sel.sum()):6d} "
              f"dense={td*1e6/copies:7.3f}us/w sparse={ts*1e6/copies:7.3f}"
              f"us/w -> {'sparse' if lab else 'dense'}",
              file=sys.stderr, flush=True)

    co = fit_logistic(np.asarray(feats), np.asarray(labels),
                      weights=np.asarray(weights, np.float64))

    # ---- selector accuracy vs the measured per-bin oracle ----
    in_kept = np.isin(bin_id, keep)
    dec = decide_hybrid_type(
        wa.unique_counts, wa.edge_counts, wa.block_partition,
        mode="calibrated", coeffs=co)[ne]
    oracle = np.array([bin_oracle.get(b, -1) for b in bin_id])
    # selector: 1=dense path; oracle label: 1=sparse faster
    sel_sparse = (dec == 0).astype(np.float64)
    ok = (sel_sparse == oracle) & in_kept
    acc_w = ok.sum() / max(in_kept.sum(), 1)
    acc_nnz = (e_all * ok).sum() / max((e_all * in_kept).sum(), 1)
    print(f"# selector accuracy vs measured oracle: {acc_w:.1%} of "
          f"windows ({acc_nnz:.1%} of nnz), on {cov_frac:.1%} "
          f"bin coverage  [reference: >90%, report §IV-C]")

    # ---- end-to-end mixed-graph contention check ----
    results = {}
    for nm, mode, cc in (("calibrated", "calibrated", co),
                         ("all_dense", "all_dense", None),
                         ("all_sparse", "all_sparse", None)):
        try:
            dur = time_path(rp, ci, n, args.dim, mode, args.dtype,
                            coeffs=cc)
            results[nm] = dur
            print(f"# mixed end-to-end {nm:11s}: {dur*1e6:9.1f} us",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 - report, keep going
            print(f"# mixed end-to-end {nm}: FAILED {exc!r}",
                  file=sys.stderr, flush=True)
    # ---- single-path collapse (VERDICT r4 #9) ----
    # The per-bin fit cannot see cross-path contention (two live kernel
    # families share dispatch/cache); when the measured END-TO-END
    # mixture loses to a constant path on its own calibration graph, the
    # calibration emits that constant path as the selector (an extreme
    # bias routes every window one way; max_cols still caps capacity).
    # By construction `calibrated <= min(all_dense, all_sparse)` then
    # holds on the calibration graph.
    from hcspmm_tpu.config import LOICoefficients

    if ("calibrated" in results and len(results) == 3
            and results["calibrated"] > min(results.values()) * 1.0):
        best = min(results, key=results.get)
        if best == "all_dense":
            co = LOICoefficients(w_cols=0.0, w_density=0.0, bias=-1e9,
                                 max_cols=co.max_cols)
            print("# mixture lost to all_dense end-to-end -> selector "
                  "collapsed to the dense path (bias=-1e9)",
                  file=sys.stderr, flush=True)
        elif best == "all_sparse":
            co = LOICoefficients(w_cols=0.0, w_density=0.0, bias=1e9,
                                 max_cols=co.max_cols)
            print("# mixture lost to all_sparse end-to-end -> selector "
                  "collapsed to the sparse path (bias=+1e9)",
                  file=sys.stderr, flush=True)

    print("# calibrated LOI coefficients (paste into PlanConfig(loi=...)):")
    print(f"LOICoefficients(w_cols={co.w_cols:.6f}, "
          f"w_density={co.w_density:.6f}, bias={co.bias:.6f}, "
          f"max_cols={co.max_cols})")
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--copies", type=int, default=2048)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--uniques", type=str, default="8,16,32,64,128,256")
    p.add_argument("--fills", type=str, default="0.1,0.3,0.6,0.9")
    p.add_argument("--mixed", type=str, default="",
                   help="calibrate on a mixture matched to this graph "
                        "spec (standin:TT, standin:RD@0.5, powerlaw:65536)")
    p.add_argument("--max-bins", type=int, default=24)
    args = p.parse_args()
    if args.mixed:
        return calibrate_mixed(args)

    from hcspmm_tpu.config import BLK_H, BLK_W
    from hcspmm_tpu.format.loi import fit_logistic
    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()

    feats, labels = [], []
    for u in (int(v) for v in args.uniques.split(",")):
        for fill in (float(v) for v in args.fills.split(",")):
            nnz = max(u, int(u * BLK_H * fill))
            rp, ci, n = window_graph(u, nnz, args.copies)
            td = time_path(rp, ci, n, args.dim, "all_dense", args.dtype)
            ts = time_path(rp, ci, n, args.dim, "all_sparse", args.dtype)
            blocks = (u + BLK_W - 1) // BLK_W
            density = nnz / (blocks * BLK_H * BLK_W)
            feats.append([u, density])
            labels.append(1.0 if ts < td else 0.0)
            print(f"u={u:4d} fill={fill:.1f} nnz={nnz:5d} "
                  f"dense={td*1e6:8.1f}us sparse={ts*1e6:8.1f}us "
                  f"-> {'sparse' if ts < td else 'dense'}",
                  file=sys.stderr, flush=True)

    co = fit_logistic(np.asarray(feats), np.asarray(labels))
    print("# calibrated LOI coefficients (paste into PlanConfig(loi=...)):")
    print(f"LOICoefficients(w_cols={co.w_cols:.6f}, "
          f"w_density={co.w_density:.6f}, bias={co.bias:.6f}, "
          f"max_cols={co.max_cols})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
