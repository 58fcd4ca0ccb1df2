#!/usr/bin/env python
"""Round-5 items #6/#7: DP at the biggest practical scale and the
LOA-fed AZ attempt (VERDICT r4).

DP (Table XVI's largest graph, 18.3M nodes / 172M edges, ref 16.7 ms):
rows at scale 0.25 (35.1M edges; A band ~4.5 GB + activations fit one
v5e HBM), prep times recorded.  AZ: the reference's LOA showcase
(+36.3%, report Fig. 14); rows under loa / cluster reorders x
tband / wide.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

REF = {"DP": 16718.30, "AZ": 240.67}
REF_NNZ = {"DP": 171_485_050, "AZ": 2_443_408}  # reference num_edges


def row(key, scale, mode, impl, dim=32):
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from tools.parity_tables import _measure_variant

    src, dst, nn, _ = io.reference_standin(key, seed=7, scale=scale)
    rp, ci = io.to_csr(src, dst, nn)
    t0 = time.perf_counter()
    perm = {"rcm": _ro.rcm_reorder, "cluster": _ro.cluster_reorder,
            "loa": _ro.loa_reorder}[mode](rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    reo_s = time.perf_counter() - t0
    nnz = int(rp[-1])
    ts, prep_s, plan = _measure_variant(rp, ci, nn, dim, impl, 2)
    med = ts[len(ts) // 2]
    our = nnz / med / 1e9
    ref_gnnz = REF_NNZ[key] / REF[key] / 1e3
    rec = dict(table="XVI-r5", graph=key, scale=scale, dim=dim,
               nodes=nn, nnz=nnz, band_impl=impl, reorder=mode,
               spmm_us=round(med * 1e6, 1),
               all_us=[round(t * 1e6, 1) for t in ts],
               gnnz_s=round(our, 4), ref_gnnz_s=round(ref_gnnz, 4),
               ratio_vs_ref=round(our / ref_gnnz, 4),
               band_widths=list(plan.band_widths),
               band_frac=round(plan.band_nnz / nnz, 3),
               spill_frac=round(getattr(plan, "spill_nnz", 0) / nnz, 3),
               prep_s=round(prep_s, 1), reorder_s=round(reo_s, 1))
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()
    what = _os.environ.get("R5_WHAT", "az,dp")
    if "az" in what:
        for mode in ("loa", "cluster"):
            for impl in ("wide", "tband"):
                try:
                    row("AZ", 1.0, mode, impl)
                except Exception as e:
                    import traceback
                    traceback.print_exc()
                    print(json.dumps({"error": f"AZ {mode}/{impl}: "
                                      f"{type(e).__name__}: {e}"}),
                          flush=True)
    if "dp" in what:
        sc = float(_os.environ.get("R5_DP_SCALE", "0.25"))
        for impl in ("tband",):
            try:
                row("DP", sc, "cluster", impl)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(json.dumps({"error": f"DP {impl}: "
                                  f"{type(e).__name__}: {e}"}),
                      flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
