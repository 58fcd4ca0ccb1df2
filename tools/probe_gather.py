#!/usr/bin/env python
"""Probe the gather/scatter primitives that decide the power-law SpMM design.

The chunked gather-aggregate architecture (column-chunked X resident in
VMEM, partial streams, bucketed scatter-add merge) is only worth building
if VMEM-resident random-row access beats the measured HBM mechanisms
(XLA take ~27 GB/s, per-row HBM DMA ~55 ns/row — round-1 numbers).  This
tool measures every candidate primitive with the drift-robust chained
timer so the design can be decided from data the moment hardware is up.

Run on the TPU:  python tools/probe_gather.py            (all probes)
                 PROBE=vmem_gather python tools/probe_gather.py

Prints one JSONL record per probe: {probe, ns_per_row, gbps, ...}.
"""

from __future__ import annotations

import functools
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def _emit(rec):
    print(json.dumps(rec), flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hcspmm_tpu.models.sag import chained_apply_time
    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()
    only = _os.environ.get("PROBE", "")
    rng = np.random.RandomState(0)

    def run(name, fn, x, rows, bytes_moved, extra=None, k1=4, k2=12):
        if only and only not in name:
            return
        try:
            dur = chained_apply_time(fn, x, k1=k1, k2=k2, trials=6)
        except Exception as e:  # noqa: BLE001 - probe must survive lowering errors
            _emit({"probe": name, "error": repr(e)[:300]})
            return
        rec = {
            "probe": name,
            "us": round(dur * 1e6, 2),
            "ns_per_row": round(dur * 1e9 / rows, 3),
            "gbps": round(bytes_moved / dur / 1e9, 1),
        }
        rec.update(extra or {})
        _emit(rec)

    # ---------------- A: VMEM-resident row gather, fori_loop ----------------
    # X chunk [W, 128] f32 resident in VMEM; gather B random rows.
    W, B = 4096, 8192
    idx = rng.randint(0, W, size=B).astype(np.int32)

    def vmem_gather_loop_kernel(idx_ref, x_ref, out_ref):
        def body(b, _):
            out_ref[pl.ds(b, 1), :] = x_ref[pl.ds(idx_ref[b], 1), :]
            return _
        jax.lax.fori_loop(0, B, body, None)

    def make_vmem_gather(dtype):
        idx_j = jnp.asarray(idx)

        def op(v):
            return pl.pallas_call(
                vmem_gather_loop_kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 128), v.dtype),
            )(idx_j, v)
        return op, jnp.asarray(rng.randn(W, 128), dtype)

    for dt in (jnp.float32, jnp.bfloat16):
        op, x = make_vmem_gather(dt)
        run(f"vmem_gather_loop_{x.dtype.name}", op, x, B,
            B * 128 * x.dtype.itemsize)

    # -------- A2: same, 8-row unrolled body (amortize loop overhead) --------
    def vmem_gather_unroll_kernel(idx_ref, x_ref, out_ref):
        def body(b0, _):
            for u in range(8):
                b = b0 * 8 + u
                out_ref[pl.ds(b, 1), :] = x_ref[pl.ds(idx_ref[b], 1), :]
            return _
        jax.lax.fori_loop(0, B // 8, body, None)

    def op_unroll(v):
        return pl.pallas_call(
            vmem_gather_unroll_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )(jnp.asarray(idx), v)

    run("vmem_gather_loop_unroll8", op_unroll,
        jnp.asarray(rng.randn(W, 128), jnp.float32), B, B * 512)

    # ------------- B: vectorized in-kernel take (Mosaic gather) -------------
    def vmem_take_kernel(idx_ref, x_ref, out_ref):
        out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    def op_take_vmem(v):
        return pl.pallas_call(
            vmem_take_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )(jnp.asarray(idx), v)

    run("vmem_take_vectorized", op_take_vmem,
        jnp.asarray(rng.randn(W, 128), jnp.float32), B, B * 512)

    # ---- B2: dynamic_gather on the SUBLANE dim via one-hot-free take of
    # transposed layout: out[:, j] = x[idx[j], :] is a lane gather when x
    # is [128, W] and idx indexes lanes.  Lane-dim dynamic gather is the
    # op Mosaic supports on newer toolchains (embedding-lookup shape).
    def vmem_take_lane_kernel(idx_ref, xt_ref, out_ref):
        out_ref[:] = jnp.take(xt_ref[:], idx_ref[:], axis=1)

    def op_take_lane(v):
        return pl.pallas_call(
            vmem_take_lane_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, B), jnp.float32),
        )(jnp.asarray(idx), v)

    run("vmem_take_lane_dim", op_take_lane,
        jnp.asarray(rng.randn(128, W), jnp.float32), B, B * 512)

    # ---------------- C: VMEM row scatter-add, fori_loop ----------------
    rows_idx = np.sort(rng.randint(0, W, size=B)).astype(np.int32)

    def vmem_scatter_kernel(idx_ref, v_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(b, _):
            r = idx_ref[b]
            out_ref[pl.ds(r, 1), :] = (
                out_ref[pl.ds(r, 1), :] + v_ref[pl.ds(b, 1), :]
            )
            return _
        jax.lax.fori_loop(0, B, body, None)

    def op_scatter(v):
        return pl.pallas_call(
            vmem_scatter_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 128), jnp.float32),
        )(jnp.asarray(rows_idx), v)

    run("vmem_scatter_add_loop", op_scatter,
        jnp.asarray(rng.randn(B, 128), jnp.float32), B, B * 512)

    # ---------------- D: HBM per-row DMA (round-1 recheck) ----------------
    from hcspmm_tpu.kernels.block_spmm import ell_bucket_spmm

    NH = 500_000
    xb = jnp.asarray(rng.randn(NH + 1, 128), jnp.float32)
    cols1 = jnp.asarray(
        rng.randint(0, NH, size=(65536, 1)).astype(np.int32))

    def op_hbm_dma(v):
        return ell_bucket_spmm(cols1, v)

    run("hbm_row_dma_ell_d1", op_hbm_dma, xb, 65536, 65536 * 512)

    # ---------------- E: XLA take at HBM scale ----------------
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        xh = jnp.asarray(rng.randn(NH, 128), dtype=dt)
        tidx = jnp.asarray(rng.randint(0, NH, size=2_000_000).astype(np.int32))
        tidx_sorted = jnp.sort(tidx)

        def op_take(v, ti=tidx):
            return jnp.take(v, ti, axis=0)[:128]

        def op_take_sorted(v, ti=tidx_sorted):
            return jnp.take(v, ti, axis=0, indices_are_sorted=True)[:128]

        bytes_req = 2_000_000 * 128 * np.dtype(dt).itemsize
        run(f"xla_take_random_{name}", op_take, xh, 2_000_000, bytes_req)
        run(f"xla_take_sorted_{name}", op_take_sorted, xh, 2_000_000,
            bytes_req)

    # ---------------- F: int4 device arrays (round-1 blocker) ----------------
    if not only or "int4" in only:
        try:
            a4 = jnp.asarray(np.ones((256, 256), np.int8)).astype(jnp.int4)
            r = jnp.dot(a4.astype(jnp.bfloat16),
                        jnp.ones((256, 128), jnp.bfloat16))
            r.block_until_ready()
            _emit({"probe": "int4_roundtrip", "ok": True,
                   "sum": float(r.sum())})
        except Exception as e:  # noqa: BLE001
            _emit({"probe": "int4_roundtrip", "ok": False,
                   "error": repr(e)[:300]})

    # ------- G: segment-sum-of-sorted via XLA at scale (phase-2 alt) -------
    seg = np.sort(rng.randint(0, NH, size=2_000_000)).astype(np.int32)
    vals = jnp.asarray(rng.randn(2_000_000, 128), jnp.float32)

    def op_segsum(v):
        return jax.ops.segment_sum(
            v, jnp.asarray(seg), num_segments=NH, indices_are_sorted=True
        )[:128]

    run("xla_segsum_sorted_f32", op_segsum, vals, 2_000_000,
        2_000_000 * 512)

    # ---- H: XLA scatter-add at HBM scale (the spill MERGE primitive) ----
    # The streamed colstream gather (kernels/colstream.py) removes the
    # take wall but leaves an UNSORTED row scatter-add; these rates decide
    # whether that formulation wins end-to-end.
    rows_r = rng.randint(0, NH, size=2_000_000).astype(np.int32)
    rows_s = np.sort(rows_r)
    for ridx, rname in ((rows_r, "random"), (rows_s, "sorted")):
        rj = jnp.asarray(ridx)

        def op_scatter_add(v, rj=rj):
            buf = jnp.zeros((NH, 128), jnp.float32)
            return buf.at[rj].add(v, mode="drop")[:128]

        run(f"xla_scatter_add_{rname}_f32", op_scatter_add, vals,
            2_000_000, 2_000_000 * 512)

    # ---- I: column-streamed MXU gather kernel (kernels/colstream.py) ----
    try:
        from hcspmm_tpu.kernels.colstream import (build_colstream,
                                                  colstream_gather)
    except ImportError:  # pruned round 5 (records in docs/ROADMAP.md)
        return 0

    for en, name in ((2_000_000, "2m"), (250_000, "250k")):
        cols_cs = rng.randint(0, NH, size=en)
        rows_cs = rng.randint(0, NH, size=en)
        tb, cl, _rf = build_colstream(cols_cs, rows_cs, group=8)

        def op_cs(v, tb=jnp.asarray(tb), cl=jnp.asarray(cl)):
            return colstream_gather(tb, cl, v, group=8)[:128]

        fill = en / (tb.shape[0] * 128)
        for dt, dn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            xcs = jnp.asarray(rng.randn(NH + 128, 128), dtype=dt)
            run(f"colstream_gather_{name}_{dn}", op_cs, xcs, en,
                tb.shape[0] * 128 * 128 * np.dtype(dt).itemsize +
                tb.shape[0] * 128 * 512,
                extra={"chunks": int(tb.shape[0]), "fill": round(fill, 3)})

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
