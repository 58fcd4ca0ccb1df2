#!/usr/bin/env python
"""Real-TPU smoke: every Pallas path vs the dense oracle on small graphs.

The interpret-mode suite (tests/) accepts kernels Mosaic later rejects
(round-2 campaign: dd_ring / dim32_fold4 failed only on hardware), so this
script compiles + numerically checks each path on the actual chip.  Prints
one line per config; full tracebacks on failure with JAX frame filtering
off.  Select configs: python tools/smoke_hw.py [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.graphs import io
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense


def graph(n=4000, deg=6, span=60, seed=0):
    src, dst, nn = io.synthetic_graph(n, deg, seed=seed, span=span)
    return io.to_csr(src, dst, nn) + (nn,)


CONFIGS = {
    # band wide kernel (production default)
    "wide": (dict(), dict(impl="pallas", band_mode="always", band_h=256)),
    # transposed band — the narrow-dim fast path (replaced the pruned
    # folded layout)
    "tband": (dict(dim=32),
              dict(impl="pallas", band_mode="always", band_h=256,
                   band_impl="tband")),
    # (the fetch-once X ring config was pruned in round 5 with its
    # kernel; record in docs/ROADMAP.md round 3)
    # dst-streamed spill merge (long-range edges force spill)
    "dstream": (dict(span=3000, deg=10),
                dict(impl="pallas", band_mode="always", band_h=256,
                     band_widths=(256,), spill_impl="dstream",
                     ds_kind="tile")),
    "take_spill": (dict(span=3000, deg=10),
                   dict(impl="pallas", band_mode="always", band_h=256,
                        band_widths=(256,), spill_impl="take")),
}


def run(name) -> bool:
    gkw, ckw = CONFIGS[name]
    dim = gkw.pop("dim", 96)
    rp, ci, nn = graph(**gkw)
    try:
        op = HybridSpMM(rp, ci, nn, PlanConfig(**ckw))
        if name == "dstream":
            assert getattr(op.plan, "ds_blk", None) is not None, \
                "plan lacks dstream arrays"
        x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)
        if getattr(op, "supports_padded", False):
            xp = op.pad_input(jnp.asarray(x))
            z = np.asarray(op.unpad_output(
                jax.jit(op.apply_padded)(op.arrays, xp)))[:nn, :dim]
        else:
            z = np.asarray(jax.jit(op)(jnp.asarray(x)))
        zref = spmm_reference_dense(rp, ci, nn, x)
        err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
        ok = err < 2e-2  # bf16 band dot tolerance
        print(f"{name}: {'OK' if ok else 'NUMERIC FAIL'} rel_err={err:.2e} "
              f"(spill_nnz={op.plan.spill_nnz})")
        return bool(ok)
    except Exception:
        print(f"{name}: FAIL")
        traceback.print_exc()
        return False


def main():
    names = sys.argv[1:] or list(CONFIGS)
    print(f"devices: {jax.devices()}")
    bad = [n for n in names if not run(n)]
    print("smoke:", "ALL OK" if not bad else f"FAILED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
