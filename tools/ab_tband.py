#!/usr/bin/env python
"""Interleaved A/B: TRANSPOSED-band kernel (kernels/tband.py) vs the wide
padded band kernel at narrow dims — the reference's dim-32/64 Table XVI
shapes (hybrid_all_kernel.cu:1321-1637).  Same process, alternating
rounds (tunnel drift makes cross-process comparisons meaningless).

Builds the DD-stand-in plan once, converts its band bucket to the
transposed layout host-side (starts rounded down to 128 alignment,
W_t = W + 128), checks numerics against the wide kernel, then times.

Env: AB_TB_DIM (default 32), AB_TB_NODES (default DD scale),
AB_TB_BH (default 256), AB_TB_DEG (default 5.03).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def transpose_band_arrays(plan, s: int):
    """Wide band bucket ``s`` -> transposed layout: 128-aligned starts and
    int8 A_t [Sb, W+128, bh] with columns shifted by start - start_t."""
    a = plan.band_a_dense(s)                      # [Sb, bh, W]
    sb, bh, w = a.shape
    starts = plan.band_starts[s].astype(np.int64)
    m = plan.padded_rows
    wt = w + 128
    st = np.minimum(starts & ~np.int64(127), max(m - wt, 0))
    st = np.maximum(st, 0)
    off = (starts - st).astype(np.int64)
    assert off.min() >= 0 and (off + w).max() <= wt, (off.min(), off.max())
    at = np.zeros((sb, wt, bh), dtype=np.int8)
    atr = a.transpose(0, 2, 1)                    # [Sb, W, bh]
    for o in np.unique(off):
        idx = np.nonzero(off == o)[0]
        at[idx, o:o + w, :] = atr[idx]
    return st.astype(np.int32), at


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.format import reorder as _ro
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.kernels.tband import tband_spmm_direct

    enable_compile_cache()

    dim = int(_os.environ.get("AB_TB_DIM", 32))
    nodes = int(_os.environ.get("AB_TB_NODES", 334_928))
    bh = int(_os.environ.get("AB_TB_BH", 256))
    deg = float(_os.environ.get("AB_TB_DEG", 5.03))
    src, dst, nn = io.synthetic_blocks(nodes, deg, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = _ro.rcm_reorder(rp, ci, nn)
    rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    nnz = int(rp[-1])

    cfg = PlanConfig(compute_dtype="bfloat16", impl="pallas",
                     band_h=bh, band_mode="always")
    op = HybridSpMM(rp, ci, nn, cfg)
    plan = op.plan
    assert op.supports_padded and len(plan.band_widths) == 1, plan.band_widths
    assert plan.spill_nnz == 0, plan.spill_nnz
    w = int(plan.band_widths[0])
    m = plan.padded_rows
    num_sw = m // bh
    print(f"plan: W={w} bh={bh} M={m} supers={num_sw} nnz={nnz}",
          file=_sys.stderr)

    x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))             # [M, 128] bf16

    # transposed layout (AB_TB_PACK: 1 = int8, 2 = nibble, 8 = 1-bit).
    # AB_TB_BASE selects the baseline: 'wide' (default) or a pack level —
    # e.g. AB_TB_BASE=1 AB_TB_PACK=2 interleaves int8-tband vs nibble-tband.
    pack = int(_os.environ.get("AB_TB_PACK", 1))
    base = _os.environ.get("AB_TB_BASE", "wide")
    st, at_raw = transpose_band_arrays(plan, 0)

    def packed(p):
        if p == 2:
            from hcspmm_tpu.kernels.tband import pack_a_nibble
            return pack_a_nibble(at_raw)
        if p == 8:
            from hcspmm_tpu.kernels.tband import pack_a_bits
            return pack_a_bits(at_raw)
        return at_raw

    at = packed(pack)
    # dt = dim padded to the bf16 sublane tile (16)
    dt = max(16, -(-dim // 16) * 16)
    xt_np = np.zeros((dt, m), dtype=np.float32)
    xt_np[:dim, :nn] = x.T
    xt = jnp.asarray(xt_np).astype(jnp.bfloat16)
    sw = jnp.asarray(plan.band_sw_ids[0].astype(np.int32))
    st_d = jnp.asarray(st)
    at_d = jnp.asarray(at)

    # ---- correctness vs the wide padded path ----
    ref = np.asarray(op.apply_padded(op.arrays, xp), dtype=np.float32)
    got = np.asarray(
        tband_spmm_direct(sw, st_d, at_d, xt, num_sw, jnp.bfloat16,
                          pack=pack),
        dtype=np.float32,
    )
    err = np.abs(got[:dim].T - ref[:, :dim])
    den = np.maximum(np.abs(ref[:, :dim]), 1.0)
    rel = (err / den).max()
    print(f"max rel err tband vs wide: {rel:.2e}", file=_sys.stderr)
    assert rel < 5e-2, rel

    class TB:
        arrays = {"sw": sw, "st": st_d, "at": at_d}

        @staticmethod
        def apply(a, v):
            return tband_spmm_direct(a["sw"], a["st"], a["at"], v,
                                     num_sw, v.dtype, pack=pack)

    if base == "wide":
        class BASE:
            arrays = op.arrays

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        base_x = xp
        a_bytes_base = num_sw * bh * w
    else:
        bp = int(base)
        at_b = packed(bp)

        class BASE:
            arrays = {"sw": sw, "st": st_d, "at": jnp.asarray(at_b)}

            @staticmethod
            def apply(a, v):
                return tband_spmm_direct(a["sw"], a["st"], a["at"], v,
                                         num_sw, v.dtype, pack=bp)

        base_x = xt
        a_bytes_base = at_b.nbytes

    a_bytes_t = at.nbytes
    for rnd in range(3):
        dw = chained_apply_time(BASE, base_x, k1=2, k2=12, trials=3)
        dtb = chained_apply_time(TB, xt, k1=2, k2=12, trials=3)
        print(
            f"round{rnd}: base[{base}]={dw*1e6:.0f}us "
            f"tband[p{pack}]={dtb*1e6:.0f}us "
            f"({nnz/dtb/1e9:.2f} Gnnz/s tband, dim={dim}) "
            f"A_bytes base={a_bytes_base/1e6:.0f}MB t={a_bytes_t/1e6:.0f}MB",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
