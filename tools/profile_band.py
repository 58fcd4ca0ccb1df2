#!/usr/bin/env python
"""Band-kernel component profile at bench scale: full vs no-dot (DMA only)
vs no-dma (compute only) vs no-A (band DMA + dot on resident A).

Isolates where the per-superwindow time goes (band DMA / A stream /
convert+dot / output write) using the bench graph and the chained-scan
timing methodology.
"""

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
    p.add_argument("--block", type=int, default=300)
    p.add_argument("--band-h", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--variants", type=str, default="full,nodot,nodma,noa")
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

    enable_compile_cache()

    src, dst, nn = io.synthetic_blocks(args.nodes, args.degree, args.block,
                                       seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    # single-bucket plan so one kernel covers everything
    plan = build_plan(rp, ci, nn, PlanConfig(
        band_h=args.band_h, band_widths=(args.width,), band_mode="always"))
    s_idx = 0
    starts = jnp.asarray(plan.band_starts[s_idx])
    a = jnp.asarray(plan.band_a_dense(s_idx))
    sb, bh, bb = a.shape
    print(f"# supers={sb} of {(nn + args.band_h - 1)//args.band_h} "
          f"band_nnz_frac={plan.band_nnz/plan.nnz:.3f}", file=_sys.stderr)
    xp = jnp.asarray(
        np.random.RandomState(0).randn(max(plan.xp_rows, nn), args.dim)
    ).astype(jnp.bfloat16)

    def kernel(starts_ref, a_ref, x_hbm, out_ref, band, sems, *, mode):
        i = pl.program_id(0)
        s = pl.num_programs(0)

        def get_dma(j, slot):
            st = pl.multiple_of(starts_ref[j], 16)
            return pltpu.make_async_copy(x_hbm.at[pl.ds(st, bb), :],
                                         band.at[slot], sems.at[slot])
        if mode != "nodma":
            @pl.when(i == 0)
            def _():
                get_dma(0, 0).start()

            @pl.when(i + 1 < s)
            def _():
                get_dma(i + 1, (i + 1) % 2).start()
            get_dma(i, i % 2).wait()
        if mode == "nodot":
            out_ref[0] = (band[i % 2, : bh, :]
                          + a_ref[0, :, :1].astype(jnp.bfloat16))
        elif mode == "noa":
            out_ref[0] = jnp.dot(band[i % 2, :bh, :], band[i % 2][:args.dim, :].T,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)[:, :args.dim]
        elif mode == "mixeddot":
            # int8 lhs fed straight to the MXU dot (no explicit astype):
            # does Mosaic fold the convert into the operand feed?
            out_ref[0] = jax.lax.dot_general(
                a_ref[0], band[i % 2],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        elif mode in ("abf16", "afp8"):
            # A stored in a directly-MXU-consumable dtype: no convert at
            # all (2x A DMA for bf16, 1x for fp8)
            out_ref[0] = jnp.dot(
                a_ref[0].astype(jnp.bfloat16) if mode == "afp8"
                else a_ref[0],
                band[i % 2],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        else:
            out_ref[0] = jnp.dot(
                a_ref[0].astype(jnp.bfloat16), band[i % 2],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    L = 3  # lookahead depth for the 'deep' variant

    def deep_kernel(starts_ref, a_hbm, x_hbm, out_ref, aband, band,
                    asems, sems):
        # manual L-deep prefetch of BOTH A blocks and X bands: the auto
        # double-buffered A pipeline leaves per-step DMA-latency stalls
        i = pl.program_id(0)
        s = pl.num_programs(0)

        def a_dma(j, slot):
            return pltpu.make_async_copy(a_hbm.at[j], aband.at[slot],
                                         asems.at[slot])

        def x_dma(j, slot):
            st = pl.multiple_of(starts_ref[j], 16)
            return pltpu.make_async_copy(x_hbm.at[pl.ds(st, bb), :],
                                         band.at[slot], sems.at[slot])

        # lookahead L-1 over L slots: starting into slot (i+L)%L == i%L
        # would race this step's own read (caught by the oracle tests;
        # kernels/block_spmm._band_body_deep is the fixed production form)
        @pl.when(i == 0)
        def _():
            for j in range(1, L - 1):
                @pl.when(j < s)
                def _():
                    a_dma(j, j % L).start()
                    x_dma(j, j % L).start()

        @pl.when(i + L - 1 < s)
        def _():
            a_dma(i + L - 1, (i + L - 1) % L).start()
            x_dma(i + L - 1, (i + L - 1) % L).start()

        @pl.when(i == 0)
        def _():
            a_dma(0, 0).start()
            x_dma(0, 0).start()

        a_dma(i, i % L).wait()
        x_dma(i, i % L).wait()
        out_ref[0] = jnp.dot(
            aband[i % L].astype(jnp.bfloat16), band[i % L],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def make_call(mode):
        if mode == "deep":
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(sb,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, bh, args.dim),
                                       lambda i, s_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((L, bh, bb), jnp.int8),
                    pltpu.VMEM((L, bb, args.dim), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((L,)),
                    pltpu.SemaphoreType.DMA((L,)),
                ])
            return lambda st, a_, x_: pl.pallas_call(
                deep_kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((sb, bh, args.dim),
                                               jnp.bfloat16),
            )(st, a_, x_)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(sb,),
            in_specs=[pl.BlockSpec((1, bh, bb), lambda i, s_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, bh, args.dim),
                                   lambda i, s_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, bb, args.dim), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((2,))])
        return lambda st, a_, x_: pl.pallas_call(
            functools.partial(kernel, mode=mode), grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((sb, bh, args.dim), jnp.bfloat16),
        )(st, a_, x_)

    def timed(mode):
        call = make_call(mode)
        a_m = a
        if mode == "abf16":
            a_m = a.astype(jnp.bfloat16)
        elif mode == "afp8":
            a_m = a.astype(jnp.float8_e4m3fn)

        def make(k):
            @jax.jit
            def g(st, a_, x_):
                def body(st_c, _):
                    o = call(st_c, a_, x_)
                    return st_c + (o[0, 0, 0] * 1e-30).astype(st_c.dtype), o[0, 0, 0]
                _, lasts = jax.lax.scan(body, st, None, length=k)
                return jnp.sum(lasts)
            return g

        g1, g2 = make(2), make(12)
        float(g1(starts, a_m, xp)); float(g2(starts, a_m, xp))

        def best(g):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(starts, a_m, xp))
                b = min(b, time.perf_counter() - t0)
            return b

        dt = (best(g2) - best(g1)) / 10
        print(f"{mode}: {dt*1e6:.0f}us ({dt/sb*1e9:.0f}ns/super)", flush=True)

    for mode in args.variants.split(","):
        timed(mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
