#!/usr/bin/env python
"""Clean streaming-bandwidth probe for the roofline constant (VERDICT r4
#5: BENCH_r04 reported roofline_frac 1.096 — the kernel outran the bytes
model at the assumed 970 GB/s, so the constant needs a measured refit).

Three variants, all drift-robust chained-timer measurements:
  auto_copy : auto-pipelined pallas identity (known-pessimistic ~500)
  deep_copy : manual 4-slot lookahead-3 DMA identity — the production
              band kernels' pipeline structure (kernels/block_spmm)
  deep_read : manual 4-slot read-only reduce (read-stream peak)

The roofline constant should be deep_copy's effective rate (the band
kernel moves A+X in and out through exactly this pipeline shape).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()
    mb = int(_os.environ.get("BW_MB", 512))
    rows = mb * 1024 * 1024 // 2 // 128
    blk = 1024
    rows = (rows // blk) * blk
    nsteps = rows // blk
    x_np = np.ones((rows, 128), np.float32)

    L = 8    # slots; read lookahead 3 leaves writebacks 4 steps of slack
    LA = 3

    def _deep_copy_kernel(v_ref, x_hbm, out_hbm, buf, isems, osems):
        i = pl.program_id(0)
        s = pl.num_programs(0)

        def rd(j, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * blk, blk), :], buf.at[slot],
                isems.at[slot])

        def wr(j, slot):
            return pltpu.make_async_copy(
                buf.at[slot], out_hbm.at[pl.ds(j * blk, blk), :],
                osems.at[slot])

        @pl.when(i == 0)
        def _():
            for j in range(LA):
                @pl.when(j < s)
                def _():
                    rd(j, j % L).start()

        @pl.when(i + LA < s)
        def _():
            # slot (i+LA)%L was written out by wr(i+LA-L), started L-LA
            # steps ago — wait it before overwriting the buffer
            @pl.when(i + LA >= L)
            def _():
                wr(i + LA - L, (i + LA) % L).wait()
            rd(i + LA, (i + LA) % L).start()

        rd(i, i % L).wait()
        @pl.when(i == 0)
        def _():
            # tie the output to the chain carry so XLA cannot hoist the
            # call out of the timing scan (no extra pass over x)
            buf[0, :8, :] += v_ref[...].astype(buf.dtype) * 1e-30

        wr(i, i % L).start()

        @pl.when(i >= s - L)
        def _():
            wr(i, i % L).wait()

    def deep_copy(x, v):
        return pl.pallas_call(
            _deep_copy_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows, 128), x.dtype),
        scratch_shapes=[
                pltpu.VMEM((L, blk, 128), x.dtype),
                pltpu.SemaphoreType.DMA((L,)),
                pltpu.SemaphoreType.DMA((L,)),
            ],
        )(v, x)

    def _deep_read_kernel(v_ref, x_hbm, out_ref, buf, acc, isems):
        i = pl.program_id(0)
        s = pl.num_programs(0)

        def rd(j, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * blk, blk), :], buf.at[slot],
                isems.at[slot])

        @pl.when(i == 0)
        def _():
            acc[...] = v_ref[...].astype(acc.dtype) * 1e-30
            for j in range(LA):
                @pl.when(j < s)
                def _():
                    rd(j, j % L).start()

        @pl.when(i + LA < s)
        def _():
            rd(i + LA, (i + LA) % L).start()

        rd(i, i % L).wait()
        acc[...] += buf[i % L, :8, :]

        @pl.when(i == s - 1)
        def _():
            out_ref[...] = acc[...]

    def deep_read(x, v):
        return pl.pallas_call(
            _deep_read_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, blk, 128), x.dtype),
                pltpu.VMEM((8, 128), x.dtype),
                pltpu.SemaphoreType.DMA((L,)),
            ],
        )(v, x)

    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(x_np).astype(dtype)
        nbytes = rows * 128 * x.dtype.itemsize

        def run(name, fn, moved):
            class W:
                arrays = {"x": x}

                @staticmethod
                def apply(a, v):
                    o = fn(a["x"], v)
                    return v.at[:1, :1].add(
                        o[0, 0].astype(v.dtype) * 1e-30)

            v0 = jnp.zeros((8, 128), dtype)
            ts = sorted(chained_apply_time(W, v0, k1=2, k2=6, trials=2)
                        for _ in range(3))
            print(json.dumps({
                "op": name, "dtype": str(dtype.__name__), "mb": mb,
                "gbps": [round(moved / t / 1e9, 1) for t in ts],
            }), flush=True)

        run("deep_copy", deep_copy, 2 * nbytes)
        run("deep_read", deep_read, nbytes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
