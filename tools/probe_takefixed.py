#!/usr/bin/env python
"""Per-op fixed cost of XLA lane takes: K successive takes of E/K
indices each from a 16 MB table (+ concat), K in {1, 4, 8, 16, 32, 64}.
Separates per-index cost from per-op overheads for the segmented
spill-gather design (many small takes vs few big ones)."""

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
    dt, u, e = 32, 1 << 18, 2_000_000
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.randn(dt, u).astype(np.float32)
                      ).astype(jnp.bfloat16)

    for k in (1, 4, 8, 16, 32, 64):
        per = e // k
        idx = jnp.asarray(rng.randint(0, u, size=(k, per))
                          .astype(np.int32))

        def ap(a, v, k=k):
            d = (v[0, 0] * 1e-30).astype(jnp.int32)
            parts = [jnp.take(a["tbl"], a["idx"][i] + d, axis=1)
                     for i in range(k)]
            g = parts[0] if k == 1 else jnp.concatenate(parts, axis=1)
            return v.at[:, :1].add(
                g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

        class W:
            arrays = {"tbl": tbl, "idx": idx}
            apply = staticmethod(ap)

        v0 = jnp.zeros((dt, 256), jnp.bfloat16)
        ts = sorted(chained_apply_time(W, v0, k1=2, k2=8, trials=2)
                    for _ in range(3))
        print(json.dumps({"k_ops": k, "idx_per_op": per,
                          "ns_per_idx": [round(t * 1e9 / e, 2)
                                         for t in ts],
                          "us_per_op": round(ts[1] * 1e6 / k, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
