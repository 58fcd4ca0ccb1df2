#!/usr/bin/env python
"""Check a synthetic stand-in graph against the reference's published
structural anchors, so benchmark numbers on stand-ins are defensible.

Anchors (report §V-B Fig. 8, Table II):
- TC-suitable window fraction on representative power-law graphs is
  15-22% (LOI intended rule) — i.e., real graphs are clustered enough
  that 1 in 5-6 of their 16-row windows compacts into <=32 unique
  columns.  Pure Chung-Lu measures ~0%.
- Degree distribution: power-law tail.
- Non-bandability: RCM cannot reduce the column extent of most
  band_h-row superwindows to a streamable width (the band path cannot
  carry the graph; gather populations must).

Usage: python tools/standin_fidelity.py DD [scale] [--kind chunglu]
Prints one JSON record per (graph, reorder) combination.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from hcspmm_tpu.format import reorder as ro
from hcspmm_tpu.format.windows import analyze_windows
from hcspmm_tpu.graphs import io


def fidelity(key: str, scale: float = 1.0, kind: str = "auto",
             seed: int = 7, reorders=("none", "rcm", "loa")) -> list:
    src, dst, n, dim = io.reference_standin(key, seed=seed, scale=scale,
                                            kind=kind)
    rp, ci = io.to_csr(src, dst, n)
    deg = np.diff(rp)
    out = []
    for mode in reorders:
        if mode == "none":
            rpp, cip = rp, ci
        else:
            fn = ro.rcm_reorder if mode == "rcm" else ro.loa_reorder
            perm = fn(rp, ci, n)
            rpp, cip = ro.apply_permutation(rp, ci, n, perm)
        wa = analyze_windows(rpp, cip, n, loi_mode="intended")
        nz = wa.edge_counts > 0
        tc = float((wa.hybrid_type[nz] == 1).mean()) if nz.any() else 0.0
        # band_h=256 superwindow extents under this order (bandability)
        bh = 256
        nsw = (n + bh - 1) // bh
        r0 = np.minimum(np.arange(nsw, dtype=np.int64) * bh, n)
        e0 = rpp.astype(np.int64)[r0]
        e1 = rpp.astype(np.int64)[np.minimum(r0 + bh, n)]
        ne = np.where(e1 > e0)[0]
        ext = np.zeros(len(ne), dtype=np.int64)
        if len(ne):
            mn = np.minimum.reduceat(cip.astype(np.int64), e0[ne])
            mx = np.maximum.reduceat(cip.astype(np.int64), e0[ne])
            ext = mx - mn + 1
        rec = {
            "graph": key,
            "kind": kind,
            "scale": scale,
            "reorder": mode,
            "nodes": n,
            "nnz": int(len(cip)),
            "tc_window_frac": round(tc, 4),
            "tc_anchor": "0.15-0.22 (report Fig. 8)",
            "deg_q50": int(np.percentile(deg, 50)),
            "deg_q90": int(np.percentile(deg, 90)),
            "deg_q99": int(np.percentile(deg, 99)),
            "deg_max": int(deg.max()),
            "extent256_q50": int(np.percentile(ext, 50)) if len(ne) else 0,
            "extent256_q90": int(np.percentile(ext, 90)) if len(ne) else 0,
            "bandable_frac_2048": (
                round(float((ext <= 2048).mean()), 4) if len(ne) else 0.0
            ),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main() -> int:
    args = [a for a in _sys.argv[1:] if not a.startswith("--")]
    kind = "chunglu" if "--kind" in " ".join(_sys.argv) and \
        "chunglu" in " ".join(_sys.argv) else "auto"
    key = args[0] if args else "DD"
    scale = float(args[1]) if len(args) > 1 else 1.0
    reorders = ("none", "rcm", "loa")
    if "--no-loa" in _sys.argv:
        reorders = ("none", "rcm")
    fidelity(key, scale, kind, reorders=reorders)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
