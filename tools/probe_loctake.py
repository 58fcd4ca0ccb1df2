#!/usr/bin/env python
"""Round-5 probe: lane-gather (jnp.take axis=1) rate from big compact
tables as a function of ACCESS LOCALITY, plus batched-merge chunk costs.

The round-4 profiling isolated the power-law spill wall as per-edge takes
from 60-90 MB compact tables at ~12 ns/edge (vs ~1.9-2.7 ns from small
tables).  Two candidate mechanisms:
  (a) pure table size (TLB/page reach) -> only per-SEGMENT tables under
      the wall help, and each take must see a small array;
  (b) access locality (the random walk over the whole table defeats any
      page/cache reuse) -> ONE big table works if consecutive indices
      stay within a small window (dst-sorted edges + segment-local
      duplicated layout), no array splitting needed.

Sweeps index streams with locality window L over a [dt, U] bf16 table:
L = U is fully random (current layout); L = 64k/256k/1M models
segment-local compact tables of those widths.
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

    dt = int(_os.environ.get("PL_DT", 32))
    e = int(_os.environ.get("PL_E", 2_000_000))  # edges (gather count)
    rng = np.random.RandomState(0)

    def time_take(name, u, window):
        """Gather e columns from a [dt, u] table; indices walk the table
        in `window`-sized locality regions (dst-sorted edge model)."""
        tbl = jnp.asarray(rng.randn(dt, u).astype(np.float32)
                          ).astype(jnp.bfloat16)
        nseg = max(1, u // window)
        per = e // nseg
        idx = np.concatenate([
            s * window + rng.randint(0, min(window, u - s * window),
                                     size=per)
            for s in range(nseg)])
        idx = jnp.asarray(idx.astype(np.int32))

        class W:
            # table threaded as a jit ARGUMENT (a closed-over multi-
            # hundred-MB constant costs minutes of XLA compile)
            arrays = {"idx": idx, "tbl": tbl}

            @staticmethod
            def apply(a, v):
                # tie the indices to the scan carry: without this the
                # gather is loop-invariant and XLA hoists it OUT of the
                # timing chain (first run measured 0.0 ns/idx)
                j = a["idx"] + (v[0, 0] * 1e-30).astype(jnp.int32)
                g = jnp.take(a["tbl"], j, axis=1)
                return v.at[:, :1].add(
                    g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

        v0 = jnp.zeros((dt, 256), jnp.bfloat16)
        ts = sorted(chained_apply_time(W, v0, k1=2, k2=8, trials=2)
                    for _ in range(3))
        mb = u * dt * 2 / 1e6
        print(json.dumps({
            "op": name, "table_mb": round(mb, 1), "window": window,
            "n_idx": int(len(idx)),
            "ns_per_idx": [round(t * 1e9 / len(idx), 2) for t in ts],
        }), flush=True)

    for u in (1 << 20, 1 << 21, 1 << 22):  # 64 / 128 / 256 MB at dt=32
        time_take("rand", u, u)
        time_take("loc1m", u, 1 << 20)
        time_take("loc256k", u, 1 << 18)
        time_take("loc64k", u, 1 << 16)
        time_take("loc16k", u, 1 << 14)
    # small-table baseline
    time_take("small", 1 << 18, 1 << 18)
    time_take("small64k", 1 << 16, 1 << 16)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
