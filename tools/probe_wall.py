#!/usr/bin/env python
"""Round-5 follow-up to probe_loctake: locate the lane-gather table-size
wall precisely and check whether a gather whose operand is a SLICE of a
big array still runs at the small-table rate.

probe_loctake result (artifacts/probe_loctake_r5.log): ~2.2 ns/idx from
tables <= 16.8 MB, ~13.3 ns from >= 67 MB, with access locality playing
NO role.  The segmented-table design needs (a) the wall boundary to set
segment caps, (b) gather-from-slice behavior since T1/T2 pieces are
static slices of bigger arrays.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    dt = 32
    e = 2_000_000
    rng = np.random.RandomState(0)

    def run(name, arrays, apply_fn, n_idx):
        class W:
            pass
        W.arrays = arrays
        W.apply = staticmethod(apply_fn)
        v0 = jnp.zeros((dt, 256), jnp.bfloat16)
        ts = sorted(chained_apply_time(W, v0, k1=2, k2=8, trials=2)
                    for _ in range(3))
        print(json.dumps({"op": name,
                          "ns_per_idx": [round(t * 1e9 / n_idx, 2)
                                         for t in ts]}), flush=True)

    def mk_tbl(u):
        return jnp.asarray(rng.randn(dt, u).astype(np.float32)
                           ).astype(jnp.bfloat16)

    # ---- wall boundary: random gathers vs table size ----
    for u in (1 << 18, 1 << 19, 3 << 18, 1 << 20, 3 << 19, 1 << 21):
        tbl = mk_tbl(u)
        idx = jnp.asarray(rng.randint(0, u, size=e).astype(np.int32))

        def ap(a, v):
            j = a["idx"] + (v[0, 0] * 1e-30).astype(jnp.int32)
            g = jnp.take(a["tbl"], j, axis=1)
            return v.at[:, :1].add(
                g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

        run(f"rand_{u * dt * 2 >> 20}mb", {"tbl": tbl, "idx": idx}, ap, e)

    # ---- gather from a static slice of a big (134 MB) array ----
    big = mk_tbl(1 << 21)
    uw = 1 << 18  # 16.8 MB window
    idx = jnp.asarray(rng.randint(0, uw, size=e).astype(np.int32))

    def ap_slice(a, v):
        j = a["idx"] + (v[0, 0] * 1e-30).astype(jnp.int32)
        g = jnp.take(a["big"][:, : 1 << 18], j, axis=1)
        return v.at[:, :1].add(
            g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

    def ap_slice_bar(a, v):
        j = a["idx"] + (v[0, 0] * 1e-30).astype(jnp.int32)
        t = jax.lax.optimization_barrier(a["big"][:, : 1 << 18])
        g = jnp.take(t, j, axis=1)
        return v.at[:, :1].add(
            g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

    run("slice16mb", {"big": big, "idx": idx}, ap_slice, e)
    run("slice16mb_bar", {"big": big, "idx": idx}, ap_slice_bar, e)

    # ---- multi-segment pattern: 8 takes from 8 slices + concat ----
    segs = 8
    per = e // segs
    idxs = jnp.asarray(rng.randint(0, uw, size=(segs, per)).astype(np.int32))

    def ap_multi(a, v):
        d = (v[0, 0] * 1e-30).astype(jnp.int32)
        parts = []
        for s in range(segs):
            t = jax.lax.optimization_barrier(
                jax.lax.dynamic_slice(a["big"], (0, s * uw // 8),
                                      (dt, uw)))
            parts.append(jnp.take(t, a["idxs"][s] + d, axis=1))
        g = jnp.concatenate(parts, axis=1)
        return v.at[:, :1].add(
            g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

    run("multi8x16mb", {"big": big, "idxs": idxs}, ap_multi, e)

    # ---- sorted monotone sweep on the big table (T1->T2 build op) ----
    sidx = jnp.asarray(np.sort(rng.randint(0, 1 << 21, size=e))
                       .astype(np.int32))

    def ap_sorted(a, v):
        j = a["idx"] + (v[0, 0] * 1e-30).astype(jnp.int32)
        g = jnp.take(a["tbl"], j, axis=1)
        return v.at[:, :1].add(
            g.sum(axis=1, keepdims=True).astype(v.dtype) * 1e-30)

    run("sorted134mb", {"tbl": big, "idx": sidx}, ap_sorted, e)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
