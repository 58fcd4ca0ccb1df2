#!/usr/bin/env python
"""Hardware check of the INTEGRATED tband path (plan -> HybridSpMM ->
apply_padded) at the reference's Table XVI dim-32 shape, interleaved
against the wide plan in one process.

Env: TB_DIM (32), TB_NODES (DD scale), TB_PACKS ('1,2'), TB_REORDER
(rcm|cluster), TB_DEG (5.03).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense
    from hcspmm_tpu.models.sag import chained_apply_time

    enable_compile_cache()

    dim = int(_os.environ.get("TB_DIM", 32))
    nodes = int(_os.environ.get("TB_NODES", 334_928))
    packs = [int(v) for v in _os.environ.get("TB_PACKS", "1,2").split(",")]
    deg = float(_os.environ.get("TB_DEG", 5.03))
    src, dst, nn = io.synthetic_blocks(nodes, deg, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    how = _os.environ.get("TB_REORDER", "rcm")
    perm = (_ro.rcm_reorder(rp, ci, nn) if how == "rcm"
            else _ro.cluster_reorder(rp, ci, nn))
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])
    x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)

    def make(impl, pack=1):
        cfg = PlanConfig(compute_dtype="bfloat16", impl="pallas",
                         band_h=int(_os.environ.get("TB_BH", 256)),
                         band_mode="always", band_impl=impl,
                         tband_pack=pack)
        op = HybridSpMM(rp, ci, nn, cfg)
        assert op.supports_padded, impl

        class W:
            arrays = op.arrays

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        return W, op.pad_input(jnp.asarray(x)), op

    variants = ([("wide", make("wide"))]
                if _os.environ.get("TB_SKIP_WIDE", "") != "1" else [])
    for p in packs:
        variants.append((f"tband_p{p}", make("tband", p)))

    # cross-variant consistency check (the wide path is oracle-tested)
    zs = {}
    for name, (wop, xp, op) in variants:
        z = np.asarray(op.unpad_output(wop.apply(wop.arrays, xp), dim),
                       dtype=np.float32)
        zs[name] = z
        print(f"{name}: plan widths={op.plan.band_widths} "
              f"spill={op.plan.spill_nnz} M={op.plan.padded_rows} "
              f"out_checksum={float(np.abs(z).sum()):.1f}",
              file=_sys.stderr)
    base_name = variants[0][0]
    for name, z in zs.items():
        err = np.abs(z - zs[base_name]).max()
        den = np.abs(zs[base_name]).max() + 1e-9
        assert err / den < 5e-2, (name, err / den)

    for rnd in range(int(_os.environ.get("TB_ROUNDS", 3))):
        row = {"round": rnd, "dim": dim, "nnz": nnz}
        for name, (wop, xp, _) in variants:
            dt = chained_apply_time(wop, xp, k1=2, k2=12, trials=3)
            row[name + "_us"] = round(dt * 1e6)
            row[name + "_gnnz"] = round(nnz / dt / 1e9, 2)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
