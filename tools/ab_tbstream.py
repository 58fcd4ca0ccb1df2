#!/usr/bin/env python
"""A/B the tbstream merge local-id layouts (round 5).

v1: local [C, bw, 1] sublane vector + standard A@B dot
v2: local [C, bw] lane vector + rhs-transposed dot

Hypothesis: v1's per-chunk [1, bw, 1] block (lane dim 1) DMA pads to
full lane tiles and carries most of the measured ~400 ns/chunk fixed
cost.  Synthetic population shaped like RD's (g=8, bw=256) and YS's
(g=16, bw=128).  Correctness cross-checked against v1 on device.
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
    from hcspmm_tpu.kernels.tspill import tbstream_merge, tbstream_merge_v2

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
        l1 = jnp.asarray(local[:c].astype(np.int32)[:, :, None])
        l2 = jnp.asarray(local[:c].astype(np.int32))
        blk_j = jnp.asarray(blk)
        buf = jnp.zeros((dt, m), jnp.bfloat16)

        # correctness cross-check on device
        o1 = np.asarray(tbstream_merge(gathered, l1, blk_j, buf, group=grp))
        o2 = np.asarray(tbstream_merge_v2(gathered, l2, blk_j, buf,
                                          group=grp))
        err = np.abs(o1 - o2).max()
        assert err < 1e-2, err

        def timed(fn, larr):
            class W:
                arrays = {"g": gathered, "l": larr, "b": blk_j}

                @staticmethod
                def apply(a, v):
                    o = fn(a["g"], a["l"], a["b"], v, group=grp)
                    return o

            ts = sorted(chained_apply_time(W, buf, k1=2, k2=8, trials=2)
                        for _ in range(3))
            return ts

        t1 = timed(tbstream_merge, l1)
        t2 = timed(tbstream_merge_v2, l2)
        t1b = timed(tbstream_merge, l1)
        t2b = timed(tbstream_merge_v2, l2)
        print(json.dumps({
            "pop": name, "chunks": c, "g": g, "bw": bw,
            "v1_us": [round(t * 1e6, 1) for t in sorted(t1 + t1b)],
            "v2_us": [round(t * 1e6, 1) for t in sorted(t2 + t2b)],
            "v1_ns_per_chunk": round(sorted(t1 + t1b)[2] * 1e9 / c, 1),
            "v2_ns_per_chunk": round(sorted(t2 + t2b)[2] * 1e9 / c, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
