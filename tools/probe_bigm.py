#!/usr/bin/env python
"""Isolate the big-M band-kernel slowdown (round 4): per-super cost
steps 350 -> 580 ns between M=335k and M=1.3M on identical structure
(tools/_bigm_test.py), and the fetch-once ring is WORSE — so X re-fetch
is not the cause.  This probe times stripped variants of the deep
pipeline at two scales:

  full  : A DMA + X DMA + dot + out write   (the production body)
  noa   : X DMA + dot(fixed A)              (A stream removed)
  nox   : A DMA + dot(fixed X)              (X stream removed)
  noout : A+X DMA + dot, write to a single block (out stream removed)

Env: PB_SUPERS (count), PB_W (640), PB_BH (256), PB_DIM lanes (128).
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

    w = int(_os.environ.get("PB_W", 640))
    bh = int(_os.environ.get("PB_BH", 256))
    dp = int(_os.environ.get("PB_DIM", 128))
    L = 4

    def make(ns, variant):
        m = ns * bh
        rng = np.random.RandomState(0)
        starts = np.minimum((np.arange(ns) * bh) // 16 * 16, m - w)
        starts = starts.astype(np.int32)
        a = (rng.rand(ns, bh, w) < 0.008).astype(np.int8)
        xp = jnp.asarray(rng.randn(m, dp).astype(np.float32)
                         ).astype(jnp.bfloat16)
        aj = jnp.asarray(a)
        st = jnp.asarray(starts)

        def kernel(st_ref, a_hbm, x_hbm, out_ref, ab, xb, asem, xsem):
            i = pl.program_id(0)
            s = pl.num_programs(0)
            la = L - 1

            def a_dma(j, slot):
                return pltpu.make_async_copy(a_hbm.at[j], ab.at[slot],
                                             asem.at[slot])

            def x_dma(j, slot):
                start = pl.multiple_of(st_ref[j], 16)
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(start, w), :], xb.at[slot],
                    xsem.at[slot])

            do_a = variant in ("full", "nox", "noout")
            do_x = variant in ("full", "noa", "noout")

            @pl.when(i == 0)
            def _():
                for j in range(la):
                    @pl.when(j < s)
                    def _():
                        if do_a:
                            a_dma(j, j).start()
                        if do_x:
                            x_dma(j, j).start()

            @pl.when(i + la < s)
            def _():
                if do_a:
                    a_dma(i + la, (i + la) % L).start()
                if do_x:
                    x_dma(i + la, (i + la) % L).start()

            if do_a:
                a_dma(i, i % L).wait()
            if do_x:
                x_dma(i, i % L).wait()
            out_ref[0] = jnp.dot(
                ab[i % L].astype(xb.dtype), xb[i % L],
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

        out_blocks = 1 if variant == "noout" else ns
        idx = ((lambda i, s_: (0, 0, 0)) if variant == "noout"
               else (lambda i, s_: (i, 0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ns,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, bh, dp), idx,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((L, bh, w), jnp.int8),
                pltpu.VMEM((L, w, dp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((L,)),
                pltpu.SemaphoreType.DMA((L,)),
            ],
        )
        fn = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_blocks, bh, dp),
                                           jnp.bfloat16),
        )

        class WCls:
            arrays = {"st": st, "a": aj}

            @staticmethod
            def apply(arrs, v):
                o = fn(arrs["st"], arrs["a"], v)
                if variant == "noout":
                    # keep the chain shape: fold the single block back
                    return v * (1 + o[0, 0, 0].astype(v.dtype) * 1e-30)
                return o.reshape(ns * bh, dp)

        return WCls, xp

    for ns in (1309, 13084):
        row = {"supers": ns, "M": ns * bh}
        for variant in ("full", "noa", "nox", "noout"):
            Wc, xp = make(ns, variant)
            t = sorted(chained_apply_time(Wc, xp, k1=2, k2=8, trials=2)
                       for _ in range(2))[0]
            row[variant + "_ns_super"] = round(t * 1e9 / ns, 1)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
