#!/usr/bin/env python
"""Interleaved band_h/width sweep at dim=32 (reference Table XVI SAG
shape, .cu:1321-1476).  At narrow dims the X band re-fetch is ~4x
cheaper than at dim 96, so the A-stream (num_sw*band_h*W elements)
dominates and the optimum moves to SMALLER band_h / narrower W than the
dim-96 operating point (bh=256/W=640).  One process, alternating
rounds, medians reported."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    dim = int(_os.environ.get("SW32_DIM", 32))
    nodes = int(_os.environ.get("SW32_NODES", 334_928))
    rounds = int(_os.environ.get("SW32_ROUNDS", 3))
    src, dst, nn = io.synthetic_blocks(nodes, 5.03, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])
    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    variants = {}
    for spec in _os.environ.get(
            "SW32_GRID", "256:auto,128:auto,64:auto,128:256,64:128"
            ).split(","):
        bh, _, w = spec.partition(":")
        bh = int(bh)
        widths = "auto" if w in ("auto", "") else (int(w),)
        cfg = PlanConfig(compute_dtype="bfloat16", impl="pallas",
                         band_h=bh, band_mode="always", band_widths=widths)
        op = HybridSpMM(rp, ci, nn, cfg)
        p = op.plan
        a_elems = sum(len(p.band_sw_ids[s]) * bh * int(bw)
                      for s, bw in enumerate(p.band_widths))
        print(f"{spec}: widths={p.band_widths} spill={p.spill_nnz} "
              f"A={a_elems/1e6:.0f}M", file=_sys.stderr)
        variants[spec] = (op, op.pad_input(x), a_elems)

    class _P:
        def __init__(self, op):
            self.op, self.arrays = op, op.arrays

        def apply(self, a, v):
            return self.op.apply_padded(a, v)

    times = {k: [] for k in variants}
    for r in range(rounds):
        for k, (op, xp, _) in variants.items():
            times[k].append(chained_apply_time(_P(op), xp, k1=2, k2=10,
                                               trials=3))
    for k, v in times.items():
        v = sorted(v)
        med = v[len(v) // 2]
        print(json.dumps({
            "sweep": "dim32_bh_w", "variant": k, "dim": dim, "nnz": nnz,
            "spmm_us": round(med * 1e6, 2),
            "all_us": [round(t * 1e6, 1) for t in v],
            "a_elems_m": round(variants[k][2] / 1e6, 1),
            "gnnz_s": round(nnz / med / 1e9, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
