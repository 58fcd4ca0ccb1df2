#!/usr/bin/env python
"""Sweep mxgather (span, k) on real spill unique-col populations.

The batched-step experiment showed mxgather's ~3.4 ns/ucol is NOT
grid-step overhead: a [dt, span] slab DMA from [dt, M] is dt strided
segments, so the cost scales with CHUNK COUNT x dt descriptors.  Wider
spans / larger k cut chunk count."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.kernels.tspill import build_mx_chunks, mxgather_lanes

    enable_compile_cache()
    rng = np.random.RandomState(0)
    dt = 32

    # YH-like: 166k uniques over 3.14M lanes; TT-like: 2.57M over 3.77M
    pops = (("yh_like", 3_141_632, 166_548),
            ("tt_like", 3_772_416, 2_567_583))
    for name, m, u in pops:
        ucols = np.sort(rng.choice(m, size=u, replace=False)).astype(np.int64)
        xt = jnp.asarray(rng.randn(dt, m).astype(np.float32)
                         ).astype(jnp.bfloat16)
        for span, k in ((1024, 128), (2048, 128), (2048, 256),
                        (4096, 256), (4096, 512)):
            lo, rel, slot = build_mx_chunks(ucols, span, k, m)
            lo_j, rel_j = jnp.asarray(lo), jnp.asarray(rel)

            class W:
                arrays = {"lo": lo_j, "rel": rel_j, "x": xt}

                @staticmethod
                def apply(a, v):
                    # tie lo to the carry or XLA hoists the whole call
                    # out of the timing scan (first run measured 0.0 us)
                    d = (v[0, 0] * 1e-30).astype(jnp.int32)
                    o = mxgather_lanes(a["x"], a["lo"] + d, a["rel"],
                                       span=span)
                    return v.at[:, :1].add(
                        o[:, :1].astype(v.dtype) * 1e-30)

            v0 = jnp.zeros((dt, 256), jnp.bfloat16)
            ts = sorted(chained_apply_time(W, v0, k1=2, k2=8, trials=2)
                        for _ in range(2))
            print(json.dumps({
                "pop": name, "span": span, "k": k, "chunks": len(lo),
                "us": [round(t * 1e6, 1) for t in ts],
                "ns_per_ucol": round(ts[0] * 1e9 / u, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
