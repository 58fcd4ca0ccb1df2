#!/usr/bin/env python
"""A/B: band_bucket_spmm_direct vs band_bucket_spmm_grouped at bench scale."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=96)
    p.add_argument("--groups", type=str, default="1,2,4,8")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.format.plan import build_plan
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.kernels import block_spmm as bs
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    cfg = PlanConfig(loi_mode="intended", compute_dtype="bfloat16",
                     impl="pallas", band_mode="auto", band_h=512,
                     band_widths=(1024,))
    plan = build_plan(rp, ci, nn, cfg)
    host = plan.device_arrays()
    num_sw = -(-nn // plan.band_h)
    s = 0
    # unpadded copies for the direct kernel (its out map writes block
    # sw_ids[i]; the capacity-padded trash id num_sw would be OOB there)
    host["band0_sw_t"] = host["band0_sw"][:num_sw]
    host["band0_start_t"] = host["band0_start"][:num_sw]
    host["band0_a_t"] = host["band0_a"][:num_sw]
    arrs = {k: jax.device_put(v) for k, v in host.items()}
    print("bucket cap:", arrs["band0_start"].shape[0], "num_sw:", num_sw,
          "sw_ids:", len(plan.band_sw_ids[0]))

    dp = 128
    x = jnp.asarray(np.random.RandomState(0).randn(nn, args.dim)
                    .astype(np.float32)).astype(jnp.bfloat16)
    pad_n = num_sw * plan.band_h + plan.band_widths[s] - nn
    xp = jnp.pad(x, ((0, pad_n), (0, dp - args.dim)))

    class Op:
        def __init__(self, f):
            self.arrays = arrs
            self.apply = f

    def direct(a, v):
        buf = bs.band_bucket_spmm_direct(
            a["band0_sw_t"], a["band0_start_t"], a["band0_a_t"], xp_from(v),
            num_sw, v.dtype)
        return buf.reshape(num_sw * plan.band_h, dp)[:nn, :args.dim]

    def xp_from(v):
        return jnp.pad(v, ((0, pad_n), (0, dp - args.dim)))

    def grouped(g):
        def f(a, v):
            buf = bs.band_bucket_spmm_grouped(
                a["band0_start"], a["band0_a"], xp_from(v), num_sw,
                v.dtype, group=g)
            return buf.reshape(num_sw * plan.band_h, dp)[:nn, :args.dim]
        return f

    ops = {"direct": Op(direct)}
    for g in (int(v) for v in args.groups.split(",")):
        ops[f"grouped{g}"] = Op(grouped(g))

    ref = None
    for name, op in ops.items():
        dur = chained_apply_time(op, x, k1=2, k2=12, trials=4)
        print(f"{name:10s}: {dur*1e6:8.1f} us")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
