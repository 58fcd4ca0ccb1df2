#!/usr/bin/env python
"""Locate the tiled-band kernel's overhead: full vs no-accumulate (=)
vs no-X-wait vs super-granular fori variant.  Diagnostic only — the
no-acc variants compute WRONG results."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=334928)
    p.add_argument("--degree", type=float, default=5.03)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--band-h", type=int, default=256)
    p.add_argument("--variants", type=str, default="full,noacc,accbf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.format.plan import build_plan
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.kernels import block_spmm as bs

    enable_compile_cache()

    src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    plan = build_plan(rp, ci, nn, PlanConfig(
        band_h=args.band_h, band_mode="always", band_impl="tiled"))
    assert plan.tiled
    arrs = {k: jax.device_put(v) for k, v in plan.device_arrays().items()}
    m = plan.padded_rows
    print(f"# pairs={len(plan.pair_tile)} fetches={int(plan.pair_fetch.sum())}",
          file=_sys.stderr)
    xp = jnp.asarray(np.random.RandomState(0).randn(m, args.dim)
                     .astype(np.float32)).astype(jnp.bfloat16)

    SL = plan.tile_slots
    AS, LAA, LAX = bs._TILED_A_SLOTS, bs._TILED_LA_A, bs._TILED_LA_X

    def kernel(tile_ref, super_ref, fetch_ref, late_ref, first_ref,
               last_ref, a_hbm, x_hbm, out_ref, aring, xring, acc,
               asems, xsems, *, mode):
        p_ = pl.program_id(0)
        n_p = pl.num_programs(0)

        def a_dma(q, slot):
            return pltpu.make_async_copy(a_hbm.at[q], aring.at[slot],
                                         asems.at[slot])

        def x_dma(q):
            t = tile_ref[q]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(t * 128, 128), 128), :],
                xring.at[t % SL], xsems.at[t % SL])

        @pl.when(p_ == 0)
        def _():
            for j in range(LAA):
                @pl.when(j < n_p)
                def _():
                    a_dma(j, j).start()
            for j in range(LAX):
                @pl.when((j < n_p) & (fetch_ref[j] == 1) & (late_ref[j] == 0))
                def _():
                    x_dma(j).start()

        @pl.when(p_ + LAA < n_p)
        def _():
            a_dma(p_ + LAA, (p_ + LAA) % AS).start()

        q = p_ + LAX
        @pl.when((q < n_p) & (fetch_ref[q] == 1) & (late_ref[q] == 0))
        def _():
            x_dma(q).start()

        @pl.when((fetch_ref[p_] == 1) & (late_ref[p_] == 1))
        def _():
            x_dma(p_).start()

        a_dma(p_, p_ % AS).wait()

        @pl.when(fetch_ref[p_] == 1)
        def _():
            x_dma(p_).wait()

        partial = jnp.dot(
            aring[p_ % AS].astype(xring.dtype),
            xring[tile_ref[p_] % SL],
            preferred_element_type=jnp.float32)

        if mode == "noacc":
            @pl.when(last_ref[p_] == 1)
            def _():
                out_ref[0] = partial.astype(out_ref.dtype)
        elif mode == "accbf16":
            @pl.when(first_ref[p_] == 1)
            def _():
                out_ref[0] = partial.astype(out_ref.dtype)
            @pl.when(first_ref[p_] == 0)
            def _():
                out_ref[0] += partial.astype(out_ref.dtype)
        else:
            @pl.when(first_ref[p_] == 1)
            def _():
                acc[:] = partial
            @pl.when(first_ref[p_] == 0)
            def _():
                acc[:] += partial
            @pl.when(last_ref[p_] == 1)
            def _():
                out_ref[0] = acc[:].astype(out_ref.dtype)

    a = arrs["tp_a"]
    p_total = a.shape[0]
    bh = plan.band_h

    def make_call(mode):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(p_total,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, bh, args.dim),
                lambda i, t_, s_, f_, l_, fi_, la_: (s_[i], 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((AS, bh, 128), jnp.int8),
                pltpu.VMEM((SL, 128, args.dim), jnp.bfloat16),
                pltpu.VMEM((bh, args.dim), jnp.float32),
                pltpu.SemaphoreType.DMA((AS,)),
                pltpu.SemaphoreType.DMA((SL,)),
            ])
        return lambda sc, a_, x_: pl.pallas_call(
            functools.partial(kernel, mode=mode), grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((m // bh, bh, args.dim),
                                           jnp.bfloat16),
        )(*sc, a_, x_)

    sc = tuple(arrs[k] for k in
               ("tp_tile", "tp_super", "tp_fetch", "tp_late",
                "tp_first", "tp_last"))

    def timed(mode):
        call = make_call(mode)

        def make(k):
            @jax.jit
            def g(sc_, a_, x_):
                def body(xc, _):
                    o = call(sc_, a_, xc)
                    upd = xc[:8, :8] * (1 + o[0, 0, 0].astype(xc.dtype) * 1e-30)
                    xc2 = jax.lax.dynamic_update_slice(xc, upd, (0, 0))
                    return xc2, o[0, 0, 0]
                xc, outs = jax.lax.scan(body, x_, None, length=k)
                return outs[-1]
            return g

        g1, g2 = make(2), make(12)
        float(g1(sc, a, xp)); float(g2(sc, a, xp))

        def best(g):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(sc, a, xp))
                b = min(b, time.perf_counter() - t0)
            return b

        dt = (best(g2) - best(g1)) / 10
        print(f"{mode}: {dt*1e6:.0f}us ({dt/p_total*1e9:.0f}ns/pair)",
              flush=True)

    for mode in args.variants.split(","):
        timed(mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
