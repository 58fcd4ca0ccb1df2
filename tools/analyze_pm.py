#!/usr/bin/env python
"""Round-5 PM plan-quality analysis (VERDICT #6): why does a 69k-nnz
graph that fits whole in VMEM run at 129.7 us (0.07x ref)?

Host-side: build PM stand-in plans at several explicit widths and modes,
print populations + modeled costs.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    from tools.parity_tables import _graph
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.format.plan import build_plan

    for mode in ("cluster", "rcm"):
        rp, ci, nn, dim, _ = _graph("PM", 1.0, mode=mode)
        for w in ("auto", 1024, 2048):
            cfg = PlanConfig(
                compute_dtype="bfloat16", impl="pallas",
                band_impl="tband", loi_mode="calibrated",
                band_widths=("auto" if w == "auto" else (w,)))
            p = build_plan(rp, ci, nn, cfg)
            nnz = int(rp[-1])
            rec = dict(
                mode=mode, W=w, widths=list(p.band_widths),
                supers=p.padded_rows // p.band_h, mp=p.padded_rows,
                band_nnz=int(p.band_nnz), spill=int(p.spill_nnz),
                spill_frac=round(p.spill_nnz / nnz, 3),
                lgroup=int(getattr(p, "ds_lgroup", 0) or 0),
                chunks=(len(p.ds_lblk) if p.ds_lblk is not None else 0),
                bw=(p.ds_tlocal.shape[1] if p.ds_tlocal is not None
                    else 0),
                missing=int(p.band_missing_sw.shape[0]),
                a_mb=round(sum(len(p.band_sw_ids[s]) * wd * p.band_h
                               for s, wd in enumerate(p.band_widths))
                           / 1e6, 1),
            )
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
