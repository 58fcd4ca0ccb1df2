#!/usr/bin/env python
"""Headline benchmark: hybrid SpMM nnz/s per chip.

The single-kernel aggregation benchmark (reference SAG profile,
GNN_model.py:251-262 / paper Table XVI) on a DD-scale stand-in graph
(the bundled example dataset is a missing blob in the reference snapshot).
DD (334,925 nodes / 1,686,092 edges, report Table II) is a union of small
disjoint protein graphs, so the stand-in is a shuffled block-diagonal
community graph; layout reordering has to rediscover the locality, as the
reference's LOA does on the real download.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: reference HC-SpMM on DD does 1,686,092 nnz / 121.57 us
= 13.87 Gnnz/s on an RTX 3090 (BASELINE.md Table XVI).

Timing: the axon tunnel adds ~35 ms of dispatch latency per call and
reorders async completion, so the SpMM is timed *inside one jit* — a
lax.scan chain of K applications with a scalar-only data dependency —
and reported as (T(K2) - T(K1)) / (K2 - K1).

Env knobs: HCSPMM_BENCH_NODES, HCSPMM_BENCH_DEGREE, HCSPMM_BENCH_DIM,
HCSPMM_BENCH_DTYPE (bfloat16|float32), HCSPMM_BENCH_MODE (loi mode),
HCSPMM_BENCH_IMPL (xla|pallas), HCSPMM_BENCH_GRAPH
(blocks|span|powerlaw|standin:<RD|TT|DD|AZ|ARXIV|PRODUCTS>[@scale]),
HCSPMM_BENCH_REORDER (rcm|loa|cluster|none), HCSPMM_BENCH_BAND (auto|always|never),
HCSPMM_BENCH_BLOCK (community size), HCSPMM_BENCH_K (chain length).
"""

from __future__ import annotations

import json
import os
import sys
import time


def chained_timer(fn, x, k1: int, k2: int, trials: int = 4):
    """Per-application seconds of ``fn`` via in-jit scan-chain differencing."""
    from hcspmm_tpu.models.sag import chained_apply_time

    return chained_apply_time(fn, x, k1=k1, k2=k2, trials=trials)


def main() -> int:
    nodes = int(os.environ.get("HCSPMM_BENCH_NODES", 334_928))
    degree = float(os.environ.get("HCSPMM_BENCH_DEGREE", 5.03))
    # dim 32 = the reference's actual Table XVI shape (the SAG profile
    # runs forward_fixed32, GNN_model.py:251-262) — round 4 made the
    # headline like-for-like; HCSPMM_BENCH_DIM=96 restores the old
    # arbitrary-dim configuration
    dim = int(os.environ.get("HCSPMM_BENCH_DIM", 32))
    dtype = os.environ.get("HCSPMM_BENCH_DTYPE", "bfloat16")
    mode = os.environ.get("HCSPMM_BENCH_MODE", "intended")
    impl = os.environ.get("HCSPMM_BENCH_IMPL", "pallas")
    graph = os.environ.get("HCSPMM_BENCH_GRAPH", "blocks")
    reorder_mode = os.environ.get("HCSPMM_BENCH_REORDER", "rcm")
    band = os.environ.get("HCSPMM_BENCH_BAND", "auto")
    block = int(os.environ.get("HCSPMM_BENCH_BLOCK", 300))
    k = int(os.environ.get("HCSPMM_BENCH_K", 32))
    k1 = int(os.environ.get("HCSPMM_BENCH_K1", 10))
    # Default band config: bh=256 + auto width (the plan resolves a single
    # bucket from the extent distribution -> one no-alias direct-write
    # kernel; measured best at DD scale: 548 us vs 729 at bh=512/W=1024)
    band_h = int(os.environ.get("HCSPMM_BENCH_BAND_H", 256))
    band_widths = os.environ.get("HCSPMM_BENCH_BAND_WIDTHS", "")  # "" = auto
    # transposed band is the measured dim<=64 fast path (kernels/tband.py,
    # tools/hw_tband.py: DD/dim32 wide 302-546 us -> tband 178-365)
    band_impl = os.environ.get(
        "HCSPMM_BENCH_BAND_IMPL", "tband" if dim <= 64 else "wide")

    import jax

    # HCSPMM_BENCH_DEVICE=cpu forces the host platform (the axon plugin
    # ignores JAX_PLATFORMS, so the config update is the only switch) —
    # used for wiring dry-runs; perf numbers come from the TPU default
    if os.environ.get("HCSPMM_BENCH_DEVICE", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: the axon tunnel costs 30-60 s per kernel
    # compile, and plans produce several distinct pallas_call shapes
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.ops.spmm import HybridSpMM

    # one-time Python imports (jax.experimental.pallas is ~2.5 s) happen
    # before the prep timer: prep_s measures graph preprocessing (plan
    # build + device upload), not interpreter warm-up
    import hcspmm_tpu.kernels.block_spmm  # noqa: F401
    import hcspmm_tpu.kernels.dstream  # noqa: F401

    t0 = time.perf_counter()
    if graph == "blocks":
        src, dst, nn = io.synthetic_blocks(nodes, degree, block, seed=7)
    elif graph == "powerlaw":
        # the reference's headline regime: non-bandable Chung-Lu tail
        # (VERDICT r1 #1); size via HCSPMM_BENCH_NODES/DEGREE
        src, dst, nn = io.synthetic_powerlaw(nodes, degree, seed=7)
    elif graph.startswith("standin:"):
        # Table II-matched power-law stand-in, e.g. standin:TT or
        # standin:RD@0.25 (scale factor after @)
        key, _, sc = graph[len("standin:"):].partition("@")
        src, dst, nn, dim = io.reference_standin(
            key, seed=7, scale=float(sc) if sc else 1.0)
    else:
        src, dst, nn = io.synthetic_graph(nodes, degree, seed=7, span=512)
    rp, ci = io.to_csr(src, dst, nn)
    nnz = int(rp[-1])
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    if reorder_mode != "none":
        from hcspmm_tpu.format import reorder as _ro

        fn = {"rcm": _ro.rcm_reorder, "loa": _ro.loa_reorder,
              "cluster": _ro.cluster_reorder}[reorder_mode]
        perm = fn(rp, ci, nn)
        rp, ci = _ro.apply_permutation(rp, ci, nn, perm)
    reorder_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    extra = {}
    if band_h:
        extra["band_h"] = band_h
    if band_widths:
        extra["band_widths"] = tuple(int(v) for v in band_widths.split(","))
    spill_impl = os.environ.get("HCSPMM_BENCH_SPILL", "")
    if spill_impl:  # default: PlanConfig's (dstream)
        extra["spill_impl"] = spill_impl
    tband_pack = int(os.environ.get("HCSPMM_BENCH_TBAND_PACK", 1))
    if band_impl == "tband":
        extra["tband_pack"] = tband_pack
    cfg = PlanConfig(loi_mode=mode, compute_dtype=dtype, impl=impl,
                     band_mode=band, band_impl=band_impl, **extra)
    op = HybridSpMM(rp, ci, nn, cfg)
    prep_s = time.perf_counter() - t0

    # inputs/outputs carried in compute dtype (training runs in bf16; the
    # reference's Table VII ran half at the same quality)
    x = jnp.asarray(
        np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    ).astype(dtype)
    # Padded activation layout [M, dp]: the framework's native form —
    # closed under SpMM application, so chained aggregations (and GNN
    # layers) run with zero pad/slice/merge passes.  Layout conversion
    # happens once, outside the timed chain, exactly as the reference's
    # X already sits in its kernels' preferred layout.
    layout = os.environ.get("HCSPMM_BENCH_LAYOUT", "padded")
    if layout == "padded" and getattr(op, "supports_padded", False):
        class _Padded:
            arrays = op.arrays

            @staticmethod
            def apply(a, v):
                return op.apply_padded(a, v)

        x_t = op.pad_input(x)
        dur = chained_timer(_Padded, x_t, k1=k1, k2=k1 + k, trials=6)
    else:
        layout = "rows"
        dur = chained_timer(op, x, k1=k1, k2=k1 + k, trials=6)

    gnnz = nnz / dur / 1e9
    baseline_gnnz = 13.87  # RTX 3090, DD, BASELINE.md Table XVI
    result = {
        "metric": "spmm_nnz_per_s_per_chip",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / baseline_gnnz, 4),
        # vs_baseline caveat: the denominator is the reference's measured
        # number on the REAL DD dataset on an RTX 3090 at dim=32 (the SAG
        # profile runs forward_fixed32); the numerator is this TPU chip on
        # a DD-matched synthetic stand-in (same dim by default since
        # round 4).  Cross-hardware + stand-in graph caveats remain.
        "baseline_ref": ("DD@dim32 RTX3090 (Table XVI), stand-in graph"
                         + ("" if dim == 32 else f", ours at dim={dim}")),
    }
    plan = op.plan
    # roofline: bytes each population must move (A blocks + X + output)
    xbytes = 2 if dtype == "bfloat16" else 4
    dp = ((dim + 127) // 128) * 128
    if getattr(plan, "tband", False):
        # transposed layout: X^T/out stream dt lanes; A_t bytes divide by
        # the device packing (int8/nibble/bit)
        dt = max(16, ((dim + 15) // 16) * 16)
        pk = plan.tband_pack
        band_bytes = sum(
            len(plan.band_sw_ids[s])
            * (plan.band_h * plan.band_widths[s] // pk)   # A_t packed
            + len(plan.band_sw_ids[s])
            * (plan.band_widths[s] * dt * xbytes)         # X^T slice
            for s in range(len(plan.band_widths))
        )
        dp = dt  # out stream is [dt, M]
    elif getattr(plan, "tiled", False):
        band_bytes = (
            len(plan.pair_tile) * plan.band_h * plan.tile_w     # A int8
            + int(plan.pair_fetch.sum()) * plan.tile_w * dp * xbytes  # X
        )
    else:
        # footprint (A is unchanged)
        band_bytes = sum(
            len(plan.band_sw_ids[s])
            * (plan.band_h * plan.band_widths[s])         # A int8
            + len(plan.band_sw_ids[s])
            * (plan.band_widths[s] * dp * xbytes)  # X band
            for s in range(len(plan.band_widths))
        )
    # gather-path traffic (nonzero when coverage is partial / band off):
    # dense/ELL gathers stage rows in an f32 container (kernels), the
    # residual path reads one row per edge
    gather_rows = sum(
        len(plan.bucket_window_ids[b]) * plan.bucket_widths[b]
        for b in range(len(plan.bucket_widths))
    ) + sum(
        len(plan.ell_row_ids[e]) * plan.ell_widths[e]
        for e in range(len(plan.ell_widths))
    ) + plan.sparse_nnz + plan.spill_nnz
    dense_a_bytes = sum(
        len(plan.bucket_window_ids[b]) * plan.window_h * plan.bucket_widths[b]
        for b in range(len(plan.bucket_widths))
    )
    gather_bytes = gather_rows * dp * 4 + dense_a_bytes
    out_bytes = nn * dp * xbytes
    total_bytes = band_bytes + gather_bytes + out_bytes  # + output
    # Roofline constant (refit round 5, VERDICT r4 #5): the chained
    # timer lets consecutive applications overlap their DMA prologue /
    # epilogue, so the *chained-mode* effective stream exceeds the
    # single-shot rates (deep-pipelined read 962 GB/s, copy 615;
    # tools/probe_stream.py, artifacts/probe_stream_r5.log) — BENCH_r04
    # measured the band kernel at 1065 GB/s effective against its byte
    # model and reported frac 1.096 against the old 970 constant.  1130
    # is the chained-mode upper envelope (max effective ever measured
    # +6%), making frac <= 1 by construction for a bytes-bound kernel.
    hbm_gbps = float(os.environ.get("HCSPMM_ROOFLINE_GBPS", 1130.0))
    roofline_us = total_bytes / hbm_gbps / 1e3
    # INTRINSIC roofline (VERDICT r3 weak #2): the CSR-ideal traffic —
    # ~8 B/nnz of A (int32 col + amortized row pointer), each referenced
    # X row read once at the TRUE feature width, the output written once.
    # The plan roofline above prices the bytes the plan CHOSE to move
    # (band padding inflates A 10-100x at low occupancy); the ratio
    # moved/intrinsic is the tracked traffic-inflation number.
    uniq_cols = int(np.unique(ci).size)
    intrinsic_bytes = (nnz * 8
                       + uniq_cols * dim * xbytes
                       + nn * dim * xbytes)
    intrinsic_us = intrinsic_bytes / hbm_gbps / 1e3
    print(
        json.dumps(
            {
                "spmm_us": round(dur * 1e6, 2),
                "roofline_us": round(roofline_us, 2),
                "roofline_frac": round(roofline_us / (dur * 1e6 + 1e-9), 3),
                "moved_mb": round(total_bytes / 1e6, 1),
                "intrinsic_mb": round(intrinsic_bytes / 1e6, 1),
                "intrinsic_us": round(intrinsic_us, 2),
                "traffic_inflation": round(
                    total_bytes / max(intrinsic_bytes, 1), 2),
                "nnz": nnz,
                "nodes": nn,
                "dim": dim,
                "dtype": dtype,
                "mode": mode,
                "layout": layout,
                "band_impl": ("tband" if getattr(plan, "tband", False)
                              else "tiled" if getattr(plan, "tiled", False)
                              else "wide"),
                "spill_impl": ("dstream"
                               if getattr(plan, "ds_blk", None) is not None
                               else "take"),
                "impl": impl,
                "graph": graph,
                "reorder": reorder_mode,
                "band_supers": plan.num_band_supers,
                "band_nnz": plan.band_nnz,
                "dense_windows": plan.num_dense_windows,
                "dense_nnz": plan.dense_nnz,
                "sparse_nnz": plan.sparse_nnz,
                "spill_nnz": plan.spill_nnz,
                "band_widths": list(plan.band_widths),
                "total_windows": (nn + 15) // 16,
                "prep_s": round(prep_s, 3),
                "reorder_s": round(reorder_s, 3),
                "graphgen_s": round(gen_s, 3),
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
