#!/usr/bin/env python
"""Band vs spill time breakdown per stand-in graph (round 4).

The Table XVI gap concentrates in the big spill-bearing graphs; the
big-M probes (tools/probe_bigm.py, tools/_bigm_test.py) show the pure
band stream running 338 (tband) / 571 (wide) ns/super at 3.3M rows, so
the per-graph residual must sit in the spill path (gathers + merge +,
for tband, the [M, dt] relayout passes).  This tool measures, in one
process per graph:

  full   : apply_padded (band + spill)           — the parity number
  band   : apply_padded with plan.has_spill off  — pure band stream
  spill  : full - band                           — derived
  merge  : the spill block alone on the padded layout

Usage: python tools/profile_parts.py YS [tband|wide] [reorder]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import copy
import json
import time

import numpy as np


def main() -> int:
    key = _sys.argv[1] if len(_sys.argv) > 1 else "YS"
    impl = _sys.argv[2] if len(_sys.argv) > 2 else "wide"
    mode = _sys.argv[3] if len(_sys.argv) > 3 else None

    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time
    from tools.parity_tables import _graph, SCALE

    enable_compile_cache()
    rp, ci, nn, dim, reo_s = _graph(key, SCALE[key], mode=mode)
    dim = 32
    t0 = time.perf_counter()
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl=impl,
        loi_mode="calibrated"))
    prep_s = time.perf_counter() - t0
    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)
    xp = op.pad_input(x)
    nnz = int(rp[-1])
    kd = int(min(256, max(8, 4_000_000 // max(nnz, 1))))

    def timed(arrs):
        class _P:
            arrays = arrs

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        ts = sorted(chained_apply_time(_P, xp, k1=2, k2=2 + kd, trials=3)
                    for _ in range(3))
        return ts

    def with_f(f):
        d = dict(op.arrays)
        d["f"] = f
        d["b"] = f
        return d

    full = timed(op.arrays)
    # stripping the spill/merge arrays turns _has_spill off (the kernels
    # gate on key presence) -> pure band stream
    f_band = {k: v for k, v in op.arrays["f"].items()
              if not k.startswith(("spill_", "ds_", "cs_"))}
    band = timed(with_f(f_band))
    # and stripping the missing-super zero pass isolates the raw kernel
    f_kern = dict(f_band)
    missing_n = 0
    if f_kern.get("band_missing_sw") is not None:
        missing_n = int(f_kern["band_missing_sw"].shape[0])
        f_kern["band_missing_sw"] = f_kern["band_missing_sw"][:0]
    kern = timed(with_f(f_kern))

    out = {
        "graph": key, "impl": impl, "reorder": mode, "nnz": nnz,
        "padded_rows": op.plan.padded_rows,
        "supers": op.plan.padded_rows // op.plan.band_h,
        "W": list(op.plan.band_widths),
        "spill_nnz": int(getattr(op.plan, "spill_nnz", 0)),
        "n_spill_rows": int(getattr(op.plan, "num_spill_rows", 0)),
        "u_cols": (len(op.plan.ds_ucols)
                   if getattr(op.plan, "ds_ucols", None) is not None
                   else -1),
        "ds_kind": getattr(op.plan, "ds_kind", "?"),
        "sb0": int(op.arrays["f"]["band0_start"].shape[0]),
        "missing_n": missing_n,
        "full_us": [round(t * 1e6, 1) for t in full],
        "band_us": [round(t * 1e6, 1) for t in band],
        "kern_us": [round(t * 1e6, 1) for t in kern],
        "spill_us": round((full[1] - band[1]) * 1e6, 1),
        "zero_us": round((band[1] - kern[1]) * 1e6, 1),
        "band_ns_per_super": round(
            band[1] * 1e9 / max(op.plan.padded_rows // op.plan.band_h, 1),
            1),
        "prep_s": round(prep_s, 2),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
