#!/usr/bin/env python
"""Interleaved A/B: auto two-bucket split vs single max-width bucket,
padded layout, same process (tunnel drift makes cross-process
comparisons meaningless)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    src, dst, nn = io.synthetic_blocks(334928, 5.03, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    x = jnp.asarray(np.random.RandomState(0).randn(nn, 96)
                    .astype(np.float32)).astype(jnp.bfloat16)

    def make(widths):
        cfg = PlanConfig(compute_dtype="bfloat16", impl="pallas",
                        band_h=256, band_widths=widths)
        op = HybridSpMM(rp, ci, nn, cfg)
        assert op.supports_padded, widths

        class W:
            arrays = op.arrays

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        return W, op.pad_input(x), op.plan.band_widths

    a_op, a_x, a_w = make("auto")
    b_op, b_x, b_w = make((640,))
    print(f"A widths={a_w}  B widths={b_w}", file=_sys.stderr)
    for rnd in range(3):
        da = chained_apply_time(a_op, a_x, k1=2, k2=12, trials=3)
        db = chained_apply_time(b_op, b_x, k1=2, k2=12, trials=3)
        print(f"round{rnd}: split={da*1e6:.0f}us single={db*1e6:.0f}us",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
