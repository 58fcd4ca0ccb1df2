#!/usr/bin/env python
"""Can a sorted (iota) gather prefault the lane-gather cache faster than
random misses fill it?

probe_workset fit: random gathers on a cold 16 MB table pay ~68 us/MB of
warming (~130 ns per 2 KB granule, serialized).  If an ascending-index
gather pass fills granules with pipelined misses, prepending it to each
segment's first use cuts the T2 warming term (GH ~6.7 ms, TT ~27 ms).

  eight16        : baseline (8x16MB tables, 250k random idx each)
  eight16_pf     : same + 32k-idx iota prefault gather per table
                   (strided 8 so every 2KB granule is touched once),
                   chained before the random gather
  eight16_pf128k : denser 128k-idx iota prefault
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()
    dt, e, k = 32, 2_000_000, 8
    per = e // k
    u = 1 << 18
    rng = np.random.RandomState(0)

    def tbl():
        return jnp.asarray(rng.randn(dt, u).astype(np.float32)
                           ).astype(jnp.bfloat16)

    idx = jnp.asarray(rng.randint(0, u, size=(k, per)).astype(np.int32))

    def run(name, n_pf):
        arrays = {f"t{i}": tbl() for i in range(k)}
        arrays["idx"] = idx
        if n_pf:
            stride = max(1, u // n_pf)
            arrays["pf"] = jnp.asarray(
                (np.arange(n_pf) * stride % u).astype(np.int32))

        def ap(a, v):
            d = (v[0, 0] * 1e-30).astype(jnp.int32)
            parts = []
            for i in range(k):
                t = a[f"t{i}"]
                dd = d
                if n_pf:
                    # ascending prefault gather; the random gather's
                    # indices depend on its result (ordering)
                    g0 = jnp.take(t, a["pf"] + d, axis=1)
                    dd = d + (g0[0, 0] * 1e-30).astype(jnp.int32)
                parts.append(jnp.take(t, a["idx"][i] + dd, axis=1))
            g = jnp.concatenate(parts, axis=1)
            return v.at[:, :1].add(
                g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

        class W:
            pass
        W.arrays = arrays
        W.apply = staticmethod(ap)
        v0 = jnp.zeros((dt, 256), jnp.bfloat16)
        ts = sorted(chained_apply_time(W, v0, k1=2, k2=8, trials=2)
                    for _ in range(3))
        print(json.dumps({"op": name, "n_pf": n_pf,
                          "ns_per_idx": [round(t * 1e9 / e, 2)
                                         for t in ts]}), flush=True)

    run("eight16", 0)
    run("eight16_pf32k", 1 << 15)
    run("eight16_pf128k", 1 << 17)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
