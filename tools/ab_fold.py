#!/usr/bin/env python
"""Interleaved A/B: narrow-dim FOLDED layout (band_fold=4) vs the plain
padded layout at dim=32 — the reference's Table XVI SAG shape
(.cu:1321-1476).  Same process, alternating rounds (tunnel drift makes
cross-process comparisons meaningless).

Optional env: AB_FOLD_DIM (default 32), AB_FOLD (default 4),
AB_FOLD_NODES (default DD scale), AB_FOLD_BH / AB_FOLD_BH_B (band_h of
the A / B variant — folding makes X re-fetch 4x cheaper, which moves
the optimal band_h DOWN: smaller bh => narrower W => fewer A elements,
the compute wall)."""

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

    dim = int(_os.environ.get("AB_FOLD_DIM", 32))
    fold = int(_os.environ.get("AB_FOLD", 4))
    nodes = int(_os.environ.get("AB_FOLD_NODES", 334_928))
    src, dst, nn = io.synthetic_blocks(nodes, 5.03, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])
    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim)
                    .astype(np.float32)).astype(jnp.bfloat16)

    bh_a = int(_os.environ.get("AB_FOLD_BH", 256))
    bh_b = int(_os.environ.get("AB_FOLD_BH_B", bh_a))

    def make(f, bh=256):
        cfg = PlanConfig(compute_dtype="bfloat16", impl="pallas",
                         band_h=bh, band_mode="always", band_fold=f)
        op = HybridSpMM(rp, ci, nn, cfg)
        assert op.supports_padded, f

        class W:
            arrays = op.arrays

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        return W, op.pad_input(x), op.plan

    a_fold = int(_os.environ.get("AB_FOLD_A", 1))
    a_op, a_x, a_plan = make(a_fold, bh_a)
    b_op, b_x, b_plan = make(fold, bh_b)
    print(f"A fold={a_fold} bh={bh_a} widths={a_plan.band_widths} "
          f"spill={a_plan.spill_nnz}  "
          f"B fold={fold} bh={bh_b} widths={b_plan.band_widths} "
          f"spill={b_plan.spill_nnz}  xf={tuple(b_x.shape)}",
          file=_sys.stderr)
    for rnd in range(3):
        da = chained_apply_time(a_op, a_x, k1=2, k2=12, trials=3)
        db = chained_apply_time(b_op, b_x, k1=2, k2=12, trials=3)
        print(f"round{rnd}: plain={da*1e6:.0f}us folded={db*1e6:.0f}us "
              f"({nnz/db/1e9:.2f} Gnnz/s folded)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
