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


def time_path(rp, ci, n, dim, mode, dtype="bfloat16"):
    import jax.numpy as jnp

    from bench import chained_timer
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM

    cfg = PlanConfig(loi_mode=mode, compute_dtype=dtype, impl="pallas",
                     band_mode="never")
    op = HybridSpMM(rp, ci, n, cfg)
    x = jnp.zeros((n, dim), jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    return chained_timer(op, x, k1=2, k2=10)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--copies", type=int, default=2048)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--uniques", type=str, default="8,16,32,64,128,256")
    p.add_argument("--fills", type=str, default="0.1,0.3,0.6,0.9")
    args = p.parse_args()

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
