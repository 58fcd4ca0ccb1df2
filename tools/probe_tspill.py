#!/usr/bin/env python
"""Primitive costs for a transposed-native tband spill path (round 4).

tband (kernels/tband.py) carries activations as X^T [dt, M]; its spill
wrapper currently pays three FULL [M, dt] relayout passes plus
sublane-penalized gathers (_tband_apply_spill).  Candidate redesigns
need the measured cost, at YS scale (M ~ 1.7M, dt 32, U ~ 170k unique
spill cols, K2 ~ 80k merge segments), of:

  tpose   : one-way [dt, M] -> [M, dt] transpose (optimization_barrier
            keeps XLA from cancelling the pair)
  lgather : jnp.take(xt, cols, axis=1) — lane-axis gather of U scattered
            columns straight out of the transposed table
  lscat   : xt.at[:, rows].add(delta) — lane-axis scatter-add of K2
            segment columns into the transposed output
  sgather : row-layout take of U rows at dt sublanes (the unpadded
            penalty path the current wrapper uses)
  sgat128 : same from a 128-lane padded table (small-table rate)

Each op runs inside one jit via the scan-chain differencing timer
(models/sag.chained_apply_time); ops fold their result back into the
carried array at ~1e-30 weight so nothing is dead-code-eliminated.
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

    m = int(_os.environ.get("PT_M", 1_753_088))  # 128-multiple
    dt = int(_os.environ.get("PT_DT", 32))
    u = int(_os.environ.get("PT_U", 170_000))
    k2 = int(_os.environ.get("PT_K2", 80_000))
    rng = np.random.RandomState(0)
    cols = jnp.asarray(np.sort(rng.choice(m, size=u, replace=False))
                       .astype(np.int32))
    rows = jnp.asarray(np.sort(rng.choice(m, size=k2, replace=False))
                       .astype(np.int32))

    def time_op(name, make_apply, shape):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)
                        ).astype(jnp.bfloat16)

        class W:
            arrays = {"cols": cols, "rows": rows}
            apply = staticmethod(make_apply)

        ts = sorted(chained_apply_time(W, x, k1=2, k2=10, trials=2)
                    for _ in range(3))
        print(json.dumps({"op": name, "us": [round(t * 1e6, 1)
                                             for t in ts]}), flush=True)

    def ap_tpose(a, v):
        return jax.lax.optimization_barrier(v.T).T

    def ap_lgather(a, v):
        g = jnp.take(v, a["cols"], axis=1)
        return v.at[:, :1].add(g.sum(axis=1, keepdims=True)
                               .astype(v.dtype) * 1e-30)

    def ap_lscat(a, v):
        delta = jax.lax.optimization_barrier(v[:, :k2] * 1e-30)
        return v.at[:, a["rows"]].add(delta)

    def ap_sgather(a, v):
        g = jnp.take(v, a["cols"], axis=0)
        return v.at[:1].add(g.sum(axis=0, keepdims=True)
                            .astype(v.dtype) * 1e-30)

    time_op("tpose", ap_tpose, (dt, m))
    time_op("lgather", ap_lgather, (dt, m))
    time_op("lscat", ap_lscat, (dt, m))
    time_op("sgather_dt", ap_sgather, (m, dt))
    time_op("sgather_128", ap_sgather, (m, 128))
    # compact-table sublane gathers (post-compaction second level): U-row
    # table, K2*avg chunk reads — approximate with k2 reads of a U table
    cols_small = jnp.asarray(rng.randint(0, u, size=k2).astype(np.int32))

    def ap_sg_small(a, v):
        g = jnp.take(v, cols_small, axis=0)
        return v.at[:1].add(g.sum(axis=0, keepdims=True)
                            .astype(v.dtype) * 1e-30)

    time_op("sg_small_dt", ap_sg_small, (u, dt))
    time_op("sg_small_128", ap_sg_small, (u, 128))

    # --- tile-granular candidates: move whole 128-lane tiles ([dt, 128]
    # = 8 KB granules), compact/expand within-tile via batched one-hot
    # matmuls.  These are the primitives of the tband spill v2 design.
    ntiles = m // 128
    tids = np.unique((np.asarray(cols) >> 7))
    t_ = len(tids)
    tids_j = jnp.asarray(tids.astype(np.int32))
    cpad = 32
    rel = rng.randint(0, 128, size=(t_, cpad)).astype(np.int32)
    rel_j = jnp.asarray(rel)
    # one-hot [T, 128, C] built on device from rel ids (iota compare)
    def onehot(relv):
        i128 = jnp.arange(128, dtype=jnp.int32)
        return (i128[None, :, None] == relv[:, None, :])

    def ap_tiletake(a, v):
        v3 = v.reshape(dt, ntiles, 128)
        g = jnp.take(v3, tids_j, axis=1)           # [dt, T, 128]
        return v.at[:, :1].add(
            g.sum(axis=(1, 2), keepdims=False)[:, None].astype(v.dtype)
            * 1e-30)

    def ap_tilecompact(a, v):
        v3 = v.reshape(dt, ntiles, 128)
        g = jnp.take(v3, tids_j, axis=1)           # [dt, T, 128]
        oh = onehot(rel_j).astype(v.dtype)         # [T, 128, C]
        c = jnp.einsum("dts,tsc->dtc", g, oh,
                       preferred_element_type=jnp.float32)
        return v.at[:, :1].add(
            c.sum(axis=(1, 2))[:, None].astype(v.dtype) * 1e-30)

    def ap_tilescat(a, v):
        v3 = v.reshape(dt, ntiles, 128)
        seg3 = jax.lax.optimization_barrier(
            v3[:, :t_, :cpad] * 1e-30)              # [dt, T, C] stand-in
        oh = onehot(rel_j).astype(v.dtype)          # [T, 128, C]
        delta = jnp.einsum("dtc,tsc->dts", seg3, oh,
                           preferred_element_type=jnp.float32)
        v3 = v3.at[:, tids_j, :].add(delta.astype(v.dtype))
        return v3.reshape(dt, m)

    def ap_ctranspose(a, v):
        c = jax.lax.optimization_barrier(v[:, : t_ * cpad])
        ct = c.T  # [T*C, dt] compact transpose
        return v.at[:, :1].add(ct.sum(axis=0)[:, None].astype(v.dtype)
                               * 1e-30)

    time_op("tile_take", ap_tiletake, (dt, m))
    time_op("tile_compact", ap_tilecompact, (dt, m))
    time_op("tile_scat", ap_tilescat, (dt, m))
    time_op("c_transpose", ap_ctranspose, (dt, m))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
