#!/usr/bin/env python
"""Does the fast lane-gather rate depend on per-op table size or on the
TOTAL WORKING SET cycled through?  8 takes of 250k idx each:

  one16    : all 8 from ONE 16 MB table          (takefixed: ~2.2 ns)
  eight16  : each from its OWN 16 MB table (134 MB total)
  slices   : each from a 16 MB static slice of one 134 MB array
             (the production segmented-gather shape)
  one2mb   : all 8 from one 2 MB table
  eight2   : each from its own 2 MB table (17 MB total)

If eight16 ~ 13 ns, the 'small-table rate' is really a cache working-set
effect and segment tables must be sized so edges-per-segment >> entries
(or the whole chain rethought)."""

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
    rng = np.random.RandomState(0)

    def run(name, mk_tables, u):
        idx = jnp.asarray(rng.randint(0, u, size=(k, per))
                          .astype(np.int32))
        arrays = mk_tables()
        arrays["idx"] = idx

        def ap(a, v):
            d = (v[0, 0] * 1e-30).astype(jnp.int32)
            parts = []
            for i in range(k):
                if "big" in a:
                    t = a["big"][:, i * u:(i + 1) * u]
                elif "t" in a:
                    t = a["t"]
                else:
                    t = a[f"t{i}"]
                parts.append(jnp.take(t, a["idx"][i] + d, axis=1))
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
        print(json.dumps({"op": name, "u": u,
                          "ns_per_idx": [round(t * 1e9 / e, 2)
                                         for t in ts]}), flush=True)

    def tbl(u):
        return jnp.asarray(rng.randn(dt, u).astype(np.float32)
                           ).astype(jnp.bfloat16)

    u16 = 1 << 18
    run("one16", lambda: {"t": tbl(u16)}, u16)
    run("eight16", lambda: {f"t{i}": tbl(u16) for i in range(k)}, u16)
    run("slices134", lambda: {"big": tbl(u16 * k)}, u16)
    u2 = 1 << 15
    run("one2mb", lambda: {"t": tbl(u2)}, u2)
    run("eight2", lambda: {f"t{i}": tbl(u2) for i in range(k)}, u2)
    u8 = 1 << 17
    run("eight8mb", lambda: {f"t{i}": tbl(u8) for i in range(k)}, u8)
    # amortization: same 8x16MB working set, 4x the accesses per table
    e = 8_000_000
    per = e // k  # noqa: F841 (rebound inside run via closure)
    globals()["_PER_OVERRIDE"] = None

    def run_big(name, mk_tables, u, e_big):
        per_b = e_big // k
        idx = jnp.asarray(rng.randint(0, u, size=(k, per_b))
                          .astype(np.int32))
        arrays = mk_tables()
        arrays["idx"] = idx

        def ap(a, v):
            d = (v[0, 0] * 1e-30).astype(jnp.int32)
            parts = [jnp.take(a[f"t{i}"], a["idx"][i] + d, axis=1)
                     for i in range(k)]
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
        print(json.dumps({"op": name, "u": u,
                          "ns_per_idx": [round(t * 1e9 / e_big, 2)
                                         for t in ts]}), flush=True)

    run_big("eight16_x4acc", lambda: {f"t{i}": tbl(u16)
                                      for i in range(k)}, u16, e)

    # --- streaming pre-touch: does a sequential reduction over the
    # table warm the gather cache at stream bandwidth?  The gather's
    # indices depend on the reduction so XLA must order sum -> gather.
    def run_touch(name, u, e_t):
        per_t = e_t // k
        idx = jnp.asarray(rng.randint(0, u, size=(k, per_t))
                          .astype(np.int32))
        arrays = {f"t{i}": tbl(u) for i in range(k)}
        arrays["idx"] = idx

        def ap(a, v):
            d = (v[0, 0] * 1e-30).astype(jnp.int32)
            parts = []
            for i in range(k):
                t = a[f"t{i}"]
                warm = (t.astype(jnp.float32).sum() * 1e-30
                        ).astype(jnp.int32)
                parts.append(jnp.take(t, a["idx"][i] + d + warm, axis=1))
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
        print(json.dumps({"op": name, "u": u,
                          "ns_per_idx": [round(t * 1e9 / e_t, 2)
                                         for t in ts]}), flush=True)

    run_touch("eight16_touch", u16, 2_000_000)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
