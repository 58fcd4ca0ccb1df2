#!/usr/bin/env python
"""Measure HBM copy bandwidth with the drift-robust chained timer.

Caveat: this pallas identity copy (512-row auto-pipelined blocks)
measures ~480-530 GB/s — a pessimistic floor, not peak stream (the auto
double-buffer leaves per-step stalls; see kernels.block_spmm's deep
pipeline).  The production band kernels sustain ~970-1100 GB/s effective
against their byte model, which is what bench.py's roofline uses."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()
    from functools import partial

    from jax.experimental import pallas as pl

    mb = int(_os.environ.get("BW_MB", 256))
    n = mb * 1024 * 1024 // 2 // 128
    n = (n // 512) * 512
    x = jnp.ones((n, 128), jnp.bfloat16)

    def _copy_kernel(inp, out):
        out[:] = inp[:]

    def op(v):
        # pallas identity copy: XLA cannot fold chained applications the
        # way it folds elementwise multiply chains (measured: a *c chain
        # collapsed to one op and reported 6.5+ TB/s)
        return pl.pallas_call(
            _copy_kernel,
            grid=(n // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 128), v.dtype),
        )(v)

    for _ in range(3):
        dur = chained_apply_time(op, x, k1=10, k2=30, trials=6)
        bw = 2 * x.nbytes / dur / 1e9
        print(f"stream: {dur*1e6:.0f} us for {2*x.nbytes/1e6:.0f} MB "
              f"-> {bw:.0f} GB/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
