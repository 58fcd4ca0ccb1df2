#!/usr/bin/env python
"""A/B the tbstream merge local-id layouts (round 5).

Times the production lane-vector merge (the round-1..4 [C, bw, 1]
sublane layout was replaced outright: it tiled to 128x memory — 10.9 GB
of ds_tlocal at DP@0.25 — and its padded-tile DMA per chunk carried
most of the measured ~400 ns/chunk fixed cost).  Synthetic populations
shaped like RD / YS / TT.
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
    from hcspmm_tpu.kernels.dstream import build_bstream
    from hcspmm_tpu.kernels.tspill import tbstream_merge

    enable_compile_cache()
    rng = np.random.RandomState(0)
    dt = 32

    for name, m, e, g, bw in (("rd_like", 1 << 22, 2_400_000, 8, 256),
                              ("ys_like", 1 << 21, 140_000, 16, 128),
                              ("tt_like", 1 << 22, 8_000_000, 4, 512)):
        rows = np.sort(rng.randint(0, m, size=e)).astype(np.int64)
        cols = rng.randint(0, e, size=e).astype(np.int64)
        gcols, local, blk, grp = build_bstream(rows, cols, m, pad_col=e,
                                               group=g, chunk_edges=bw)
        c = len(blk)
        gathered = jnp.asarray(
            rng.randn(dt, c * bw).astype(np.float32)).astype(jnp.bfloat16)
        l2 = jnp.asarray(local.astype(np.int32))
        blk_j = jnp.asarray(blk)
        buf = jnp.zeros((dt, m), jnp.bfloat16)

        def timed(larr):
            class W:
                arrays = {"g": gathered, "l": larr, "b": blk_j}

                @staticmethod
                def apply(a, v):
                    return tbstream_merge(a["g"], a["l"], a["b"], v,
                                          group=grp)

            ts = sorted(chained_apply_time(W, buf, k1=2, k2=8, trials=2)
                        for _ in range(3))
            return ts

        t2 = sorted(timed(l2) + timed(l2))
        print(json.dumps({
            "pop": name, "chunks": c, "g": g, "bw": bw,
            "us": [round(t * 1e6, 1) for t in t2],
            "ns_per_chunk": round(t2[2] * 1e9 / c, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
