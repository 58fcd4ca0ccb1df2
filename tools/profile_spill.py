#!/usr/bin/env python
"""Component profile of a band+spill plan on hardware: band kernel alone,
spill gather (XLA take) alone, dstream merge alone, full apply_padded.
All timed with the drift-robust chained timer in one process."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", type=str, default="standin:RD@0.25")
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--spill", type=str, default="dstream")
    p.add_argument("--k", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.kernels import block_spmm as bs

    enable_compile_cache()

    dim = args.dim
    if args.graph == "powerlaw":
        src, dst, nn = io.synthetic_powerlaw(args.nodes, args.degree, seed=7)
    elif args.graph.startswith("standin:"):
        key, _, sc = args.graph[len("standin:"):].partition("@")
        src, dst, nn, dim = io.reference_standin(
            key, seed=7, scale=float(sc) if sc else 1.0)
    else:
        src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, 300,
                                           seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.cluster_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])

    op = HybridSpMM(rp, ci, nn, PlanConfig(
        loi_mode="intended", compute_dtype="bfloat16", impl="pallas",
        band_h=256, spill_impl=args.spill,
        band_widths=(args.width,)))
    plan = op.plan
    arrs = op.arrays
    f = arrs["f"] if "f" in arrs else arrs
    print(f"nodes={nn} nnz={nnz} dim={dim} widths={plan.band_widths} "
          f"band={plan.band_nnz} spill={plan.spill_nnz} "
          f"rows={plan.num_spill_rows} "
          f"ds_group={getattr(plan, 'ds_group', 0)}", file=_sys.stderr)

    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)
    xp = op.pad_input(x)
    m, dp = xp.shape
    num_sw = m // plan.band_h

    class _W:
        """Wrap a (arrs, xp)->[M,dp] function for chained_apply_time.
        The wrapped fn must return something xp-shaped."""
        def __init__(self, fn, a):
            self.fn = fn
            self.arrays = a

        def apply(self, a, v):
            return self.fn(a, v)

    results = {}

    def timeit(name, fn, a):
        w = _W(fn, a)
        durs = sorted(chained_apply_time(w, xp, k1=2, k2=2 + args.k,
                                         trials=3) for _ in range(3))
        results[name] = durs[1]
        print(json.dumps({"profile": args.graph, "part": name,
                          "us": round(durs[1] * 1e6, 2),
                          "all_us": [round(t * 1e6, 1) for t in durs]}))

    # 1. full padded apply
    timeit("full", lambda a, v: op.apply_padded(a, v), arrs)

    # 2. band kernel only
    s_main = max((i for i in range(len(plan.band_widths))
                  if f[f"band{i}_start"].shape[0] > 0),
                 key=lambda i: len(plan.band_sw_ids[i]), default=None)
    if s_main is not None:
        def band_only(a, v):
            af = a["f"] if "f" in a else a
            return bs.band_direct_dispatch(
                af, s_main, v, num_sw, v.dtype).reshape(m, dp)
        timeit("band", band_only, arrs)

    if plan.has_spill and "spill_rows" in f:
        # 3. spill gather only (the take) — sum keeps it honest
        gcols_key = "ds_gcols" if "ds_gcols" in f else "spill_edge_col"

        def gather_only(a, v):
            af = a["f"] if "f" in a else a
            g = jnp.take(v, af[gcols_key], axis=0, mode="clip")
            # fold back to [M, dp] so the chain stays closed
            return v + g[: 1, :] * 1e-30
        timeit("gather", gather_only, arrs)

        # 4. full spill (gather + merge) on a zero buffer
        from hcspmm_tpu.kernels.block_spmm import apply_spill

        def spill_only(a, v):
            af = a["f"] if "f" in a else a
            return apply_spill(v, af, v, plan)
        timeit("spill", spill_only, arrs)

    print(json.dumps({"profile": args.graph, "summary": True,
                      "parts_us": {k: round(v * 1e6, 1)
                                   for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
