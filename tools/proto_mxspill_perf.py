#!/usr/bin/env python
"""Perf prototype: deep-pipelined mxgather_lanes at YS scale.

Measures the Pallas slab-DMA + one-hot-dot gather (compact table build
straight from the transposed activation layout) against the 2.4-2.8 ms
XLA take baseline (tools/probe_tspill.py lgather/sgather).  Sweep of
(SPAN, K) chunk geometries; uniform-random sorted unique cols stand in
for the real ds_ucols distribution.

Env: MX_M, MX_DT, MX_U.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 4  # DMA pipeline slots (lookahead L-1), as kernels/block_spmm.py


def build_chunks(ucols: np.ndarray, span: int, k: int, m: int):
    """Greedy chunking of sorted unique cols: each chunk covers <= k cols
    whose lane span fits ``span`` from a 128-aligned slab base.  Returns
    (lo [C] int32, rel [C, 1, k] int32 (-1 pad), slot [U] int32 — each
    col's position in the compact [C*k] table)."""
    u = len(ucols)
    lo, rel, slot = [], [], np.empty(u, dtype=np.int32)
    i = 0
    while i < u:
        base = (int(ucols[i]) // 128) * 128
        base = min(base, m - span)
        j = min(i + k, u)
        # cols must fall inside [base, base+span)
        j = min(j, int(np.searchsorted(ucols, base + span)))
        c = len(lo)
        r = np.full(k, -1, dtype=np.int32)
        r[: j - i] = ucols[i:j] - base
        lo.append(base)
        rel.append(r)
        slot[i:j] = c * k + np.arange(j - i)
        i = j
    return (np.asarray(lo, dtype=np.int32),
            np.stack(rel)[:, None, :].astype(np.int32), slot)


def mxgather_lanes(xt, lo, rel, *, span: int, variant: str = "lhsT"):
    """Compact-table build from the transposed layout: out[c*K+j] =
    xt[:, lo[c]+rel[c,j]] as rows ([C*K, dt]); rel -1 pads give zero
    rows.  Deep-pipelined slab DMA + iota-one-hot MXU dot per chunk."""
    c = lo.shape[0]
    k = rel.shape[1] if variant == "rhsT" else rel.shape[2]
    dt, m = xt.shape

    def kern(lo_ref, rel_ref, x_hbm, out_ref, slabs, sems):
        i = pl.program_id(0)
        s = pl.num_programs(0)
        la = L - 1

        def dma(j, slot):
            base = pl.multiple_of(lo_ref[j], 128)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(base, span)], slabs.at[slot],
                sems.at[slot])

        @pl.when(i == 0)
        def _():
            for j in range(la):
                @pl.when(j < s)
                def _():
                    dma(j, j).start()

        @pl.when(i + la < s)
        def _():
            dma(i + la, (i + la) % L).start()

        dma(i, i % L).wait()
        if variant == "lhsT":
            iota = jax.lax.broadcasted_iota(jnp.int32, (span, k), 0)
            oh = (iota == rel_ref[0, 0][None, :]).astype(xt.dtype)
            out_ref[0] = jax.lax.dot_general(
                oh, slabs[i % L],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        elif variant == "std":
            iota = jax.lax.broadcasted_iota(jnp.int32, (span, k), 0)
            oh = (iota == rel_ref[0, 0][None, :]).astype(xt.dtype)
            out_ref[0] = jnp.dot(
                slabs[i % L], oh,
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        else:  # rhsT: one-hot built transposed, dot contracts minor dims
            iota = jax.lax.broadcasted_iota(jnp.int32, (k, span), 1)
            oh_t = (iota == rel_ref[0, :, 0][:, None]).astype(xt.dtype)
            out_ref[0] = jax.lax.dot_general(
                oh_t, slabs[i % L],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, k, 1) if variant == "rhsT" else (1, 1, k),
                         lambda i, lo_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, dt, k) if variant == "std" else (1, k, dt),
            lambda i, lo_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, dt, span), xt.dtype),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    oshape = (c, dt, k) if variant == "std" else (c, k, dt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(oshape, xt.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(lo, rel, xt)
    return out if variant == "std" else out.reshape(c * k, dt)


def main() -> int:
    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()
    m = int(_os.environ.get("MX_M", 1_753_088))
    dt = int(_os.environ.get("MX_DT", 32))
    u = int(_os.environ.get("MX_U", 93_647))
    rng = np.random.RandomState(0)
    ucols = np.sort(rng.choice(m, size=u, replace=False)).astype(np.int64)
    xt_np = rng.randn(dt, m).astype(np.float32)
    xt = jnp.asarray(xt_np).astype(jnp.bfloat16)

    # numerics check once (small)
    lo, rel, slot = build_chunks(ucols[:500], 512, 64, m)
    got = np.asarray(mxgather_lanes(xt, jnp.asarray(lo), jnp.asarray(rel),
                                    span=512))
    want = xt_np[:, ucols[:500]].T
    err = np.abs(got[slot] - want).max() / (np.abs(want).max() + 1e-9)
    print(json.dumps({"check_rel_err": float(err)}), flush=True)
    assert err < 2e-2

    for span, k in ((512, 64), (1024, 128), (2048, 256), (4096, 512)):
        lo, rel, slot = build_chunks(ucols, span, k, m)
        c = lo.shape[0]
        loj = jnp.asarray(lo)
        for variant in ("lhsT", "std", "rhsT"):
            relv = rel.transpose(0, 2, 1) if variant == "rhsT" else rel
            relj = jnp.asarray(relv)

            class W:
                arrays = {"lo": loj, "rel": relj}

                @staticmethod
                def apply(a, v, _s=span, _v=variant):
                    g = mxgather_lanes(v, a["lo"], a["rel"], span=_s,
                                       variant=_v)
                    red = (g.sum(axis=(0, 2)) if _v == "std"
                           else g.sum(axis=0))
                    return v.at[:, :1].add(
                        red[:, None].astype(v.dtype) * 1e-30)

            ts = sorted(chained_apply_time(W, xt, k1=2, k2=10, trials=2)
                        for _ in range(3))
            print(json.dumps({
                "span": span, "k": k, "variant": variant, "chunks": c,
                "us": [round(t * 1e6, 1) for t in ts],
                "ns_per_ucol": round(ts[1] * 1e9 / u, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
