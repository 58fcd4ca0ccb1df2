#!/usr/bin/env python
"""A/B harness for the spill/gather population — the dominant cost on
power-law graphs (VERDICT r1 #1).  Times candidate formulations of
``out[seg] += X[col]`` over the real spill edge set of a bench graph,
interleaved in one process (tunnel drift makes cross-process comparison
meaningless; see docs/ROADMAP.md timing notes).

Variants:
  take_f32    current production: take (compute dtype) -> astype(f32)
              -> sorted segment_sum
  take_bf16   segment_sum accumulates in bf16 (halves reduce input bytes
              if XLA materializes the converted operand; precision risk
              measured separately by tests, this is timing only)
  take_only   jnp.take alone — isolates gather cost from reduce cost
  colsort     edges pre-sorted by COLUMN: sequential-ish gather locality,
              scatter-side segment_sum (indices_are_sorted=False)
  dedup       global unique-col take, then expand by inverse index +
              sorted segment_sum (pays a second gather from the compact
              array; wins only if gather cost depends on source size)
  colstream_only     column-streamed MXU gather kernel alone
                     (kernels/colstream.py): 32 KB tile DMAs + one-hot
                     dots instead of per-row take — the take_only rival
  colstream_scatter  colstream gather + unsorted scatter-add merge onto
                     the padded row space — the scatter_rows rival

Env: HCSPMM_AB_NODES, HCSPMM_AB_DEGREE, HCSPMM_AB_GRAPH, HCSPMM_AB_DIM,
HCSPMM_AB_DEVICE=cpu.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    nodes = int(os.environ.get("HCSPMM_AB_NODES", 334_928))
    degree = float(os.environ.get("HCSPMM_AB_DEGREE", 5.03))
    graph = os.environ.get("HCSPMM_AB_GRAPH", "powerlaw")
    dim = int(os.environ.get("HCSPMM_AB_DIM", 96))

    import jax

    if os.environ.get("HCSPMM_AB_DEVICE", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.format import reorder as ro
    from hcspmm_tpu.format.plan import build_plan
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.models.sag import chained_apply_time

    if graph == "powerlaw":
        src, dst, nn = io.synthetic_powerlaw(nodes, degree, seed=7)
    elif graph.startswith("standin:"):
        key, _, sc = graph[len("standin:"):].partition("@")
        src, dst, nn, dim = io.reference_standin(
            key, seed=7, scale=float(sc) if sc else 1.0)
    else:
        src, dst, nn = io.synthetic_blocks(nodes, degree, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = ro.cluster_reorder(rp, ci, nn)
    rp, ci = ro.apply_permutation(rp, ci, nn, perm)
    plan = build_plan(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_h=256))
    arrs = plan.device_arrays(dense_band=False)
    if "spill_edge_col" not in arrs or plan.spill_nnz == 0:
        print(json.dumps({"error": "no spill population on this graph"}))
        return 1
    cols = np.asarray(arrs["spill_edge_col"])
    segs = np.asarray(arrs["spill_edge_seg"])
    nrow = plan.num_spill_rows
    ne = len(cols)
    dp = -(-dim // 128) * 128
    xp = jnp.asarray(
        np.random.RandomState(0).randn(plan.xp_rows, dp).astype(np.float32)
    ).astype(jnp.bfloat16)

    colv = jnp.asarray(cols)
    segv = jnp.asarray(segs)
    order = np.argsort(cols, kind="stable")
    colv_s = jnp.asarray(cols[order])
    segv_s = jnp.asarray(segs[order])
    uniq, inv = np.unique(cols, return_inverse=True)
    uniqv = jnp.asarray(uniq)
    invv = jnp.asarray(inv.astype(np.int32))

    def take_f32(x):
        xe = jnp.take(x, colv, axis=0)
        return jax.ops.segment_sum(
            xe.astype(jnp.float32), segv, num_segments=nrow + 1,
            indices_are_sorted=True)

    def take_bf16(x):
        xe = jnp.take(x, colv, axis=0)
        return jax.ops.segment_sum(
            xe, segv, num_segments=nrow + 1, indices_are_sorted=True)

    def take_only(x):
        return jnp.take(x, colv, axis=0)

    def colsort(x):
        xe = jnp.take(x, colv_s, axis=0)
        return jax.ops.segment_sum(
            xe.astype(jnp.float32), segv_s, num_segments=nrow + 1,
            indices_are_sorted=False)

    def dedup(x):
        xu = jnp.take(x, uniqv, axis=0)
        xe = jnp.take(xu, invv, axis=0)
        return jax.ops.segment_sum(
            xe.astype(jnp.float32), segv, num_segments=nrow + 1,
            indices_are_sorted=True)

    # merge-cost variants: the production path adds the per-spill-row sums
    # onto the band output.  scatter_rows is the current formulation
    # (out.at[rows].add); segsum_global segment-sums straight into the
    # global row space and adds densely (XLA scatter on TPU can serialize
    # — the variant that wins here decides apply_spill's shape).
    rowsv = jnp.asarray(np.asarray(arrs["spill_rows"]))
    m_rows = plan.padded_rows
    # global segment ids: each edge's local segment -> its global row
    # (dropped sentinel -> row m_rows)
    sr = np.asarray(arrs["spill_rows"]).astype(np.int64)
    gseg_np = np.where(segs < nrow, sr[np.minimum(segs, nrow - 1)], m_rows)
    g_sorted = bool(np.all(np.diff(gseg_np) >= 0))
    g_seg = jnp.asarray(gseg_np.astype(np.int32))

    def scatter_rows(x):
        seg = take_f32(x)[:nrow]
        buf = jnp.zeros((m_rows, x.shape[1]), jnp.float32)
        return buf.at[rowsv].add(seg, mode="drop")

    def segsum_global(x):
        xe = jnp.take(x, colv, axis=0)
        return jax.ops.segment_sum(
            xe.astype(jnp.float32), g_seg, num_segments=m_rows + 1,
            indices_are_sorted=g_sorted)[:m_rows]

    # column-streamed MXU gather: PRUNED in round 5 (measured slower
    # than take in every config); the variants below are skipped when
    # the module is absent.  Historical records: docs/ROADMAP.md r2-3.
    # (the plan arrays are capacity-padded at the tail)
    try:
        from hcspmm_tpu.kernels.colstream import (build_colstream,
                                                  colstream_gather)
        has_cs = True
    except ImportError:
        has_cs = False

    if has_cs:
        nreal = plan.spill_nnz
        rows_g = np.where(segs[:nreal] < nrow,
                          sr[np.minimum(segs[:nreal], nrow - 1)], m_rows)
        tb, cl, rf = build_colstream(cols[:nreal], rows_g, group=8)
        tbv, clv = jnp.asarray(tb), jnp.asarray(cl)
        rfv = jnp.asarray(rf)

        def colstream_only(x):
            return colstream_gather(tbv, clv, x, group=8)[:128]

        def colstream_scatter(x):
            g = colstream_gather(tbv, clv, x, group=8)
            buf = jnp.zeros((m_rows, x.shape[1]), jnp.float32)
            return buf.at[rfv].add(g, mode="drop")

    variants = {
        "take_f32": take_f32,
        "take_bf16": take_bf16,
        "take_only": take_only,
        "colsort": colsort,
        "dedup": dedup,
        "scatter_rows": scatter_rows,
        "segsum_global": segsum_global,
        **({"colstream_only": colstream_only,
            "colstream_scatter": colstream_scatter} if has_cs else {}),
    }
    base = {
        "nnz_spill": ne, "unique_cols": len(uniq), "rows": nrow,
        "dim": dp, "graph": graph, "nodes": nn,
        "device": str(jax.devices()[0]),
    }
    # two interleaved rounds over all variants; report per-round so
    # cross-variant drift is visible
    results = {k: [] for k in variants}
    for _ in range(2):
        for name, fn in variants.items():
            dur = chained_apply_time(fn, xp, k1=4, k2=12, trials=4)
            results[name].append(round(dur * 1e6, 1))
    for name, us in results.items():
        rec = dict(base)
        rec.update({"variant": name, "us": us,
                    "ns_per_edge": round(min(us) * 1e3 / ne, 2),
                    "gbps": round(ne * dp * 2 / (min(us) * 1e-6) / 1e9, 1)})
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
