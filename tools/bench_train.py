#!/usr/bin/env python
"""End-to-end GNN training benchmarks — the BASELINE.json config sweep.

Configs (BASELINE.md §configs):
  gcn2   : 2-layer GCN on the DD-scale example stand-in
  gin5   : 5-layer GIN, hidden=64 (reference Reddit config, scaled by
           --nodes since the real Reddit download needs egress)
  loi    : LOI/band threshold ablation (band auto/always/never)

Epoch time is measured with the in-jit chained methodology (a scan over
train steps with the parameter pytree as the carry — exactly what a real
training loop compiles to), so axon dispatch latency doesn't pollute it.

Emits one JSONL record per config to stdout.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def epoch_time(step_fn, params, opt_state, x, y, rng, k1=2, k2=8, trials=3):
    import jax

    # thread the op's plan arrays through the jit (closure constants of
    # this size cost minutes of compile — ops.spmm.make_spmm docstring)
    arrays = getattr(step_fn, "arrays", None)
    inner = getattr(step_fn, "step_with_arrays",
                    lambda p, o, a, x, y, r: step_fn(p, o, x, y, r))

    def make(k):
        @jax.jit
        def g(params, opt_state, arrs, x, y, rng):
            def body(carry, _):
                p, o = carry
                p, o, loss = inner(p, o, arrs, x, y, rng)
                return (p, o), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state),
                                          None, length=k)
            return losses[-1]
        return g

    g1, g2 = make(k1), make(k2)
    float(g1(params, opt_state, arrays, x, y, rng))
    float(g2(params, opt_state, arrays, x, y, rng))

    def one(g):
        t0 = time.perf_counter()
        float(g(params, opt_state, arrays, x, y, rng))
        return time.perf_counter() - t0

    # interleaved pair differencing (models/sag.py): chip-speed drift
    # between separated K1/K2 phases corrupts the difference
    diffs = sorted(one(g2) - one(g1) for _ in range(trials))
    return diffs[len(diffs) // 2] / (k2 - k1)


def forward_time(step_fn, params, x, y, rng, k1=2, k2=8, trials=3):
    """Forward-pass-only epoch seconds (reference Tables VIII/IX split
    epoch time into Fwd and Bwd; bwd here = full step - fwd)."""
    import jax

    arrays = getattr(step_fn, "arrays", None)
    loss_fn = step_fn.loss_with_arrays

    def make(k):
        @jax.jit
        def g(params, arrs, x, y, rng):
            def body(xc, _):
                loss = loss_fn(params, arrs, xc, y, rng)
                # loss -> next-x dependency: without it XLA hoists the
                # (iteration-invariant) loss out of the scan and the
                # chain measures nothing (models/sag.py trick)
                upd = xc[:8, :8] * (1 + loss.astype(xc.dtype) * 1e-30)
                return jax.lax.dynamic_update_slice(xc, upd, (0, 0)), loss
            _, losses = jax.lax.scan(body, x, None, length=k)
            return losses[-1]
        return g

    g1, g2 = make(k1), make(k2)
    float(g1(params, arrays, x, y, rng))
    float(g2(params, arrays, x, y, rng))

    def one(g):
        t0 = time.perf_counter()
        float(g(params, arrays, x, y, rng))
        return time.perf_counter() - t0

    diffs = sorted(one(g2) - one(g1) for _ in range(trials))
    return diffs[len(diffs) // 2] / (k2 - k1)


def make_graph(spec, nodes, degree, block, seed=7):
    """'blocks' | 'standin:KEY[@scale]' | 'powerlaw' -> (rp, ci, n, dim)."""
    from hcspmm_tpu.graphs import io

    dim = None
    if spec == "blocks":
        src, dst, nn = io.synthetic_blocks(nodes, degree, block, seed=seed)
    elif spec == "powerlaw":
        src, dst, nn = io.synthetic_powerlaw(nodes, degree, seed=seed)
    elif spec.startswith("standin:"):
        key, _, sc = spec[len("standin:"):].partition("@")
        src, dst, nn, dim = io.reference_standin(
            key, seed=seed, scale=float(sc) if sc else 1.0)
    else:
        raise ValueError(f"unknown graph spec {spec}")
    rp, ci = io.to_csr(src, dst, nn)
    return rp, ci, nn, dim


def run_config(name, model, layers, hidden, dim, classes, nodes, degree,
               block, impl, dtype, band, reorder_mode, graph="blocks",
               band_impl="wide", loi_mode="intended"):
    import jax
    import jax.numpy as jnp
    import optax

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.models.net import Net, init_net_params
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.train.loop import make_train_step

    rp, ci, nn, g_dim = make_graph(graph, nodes, degree, block)
    dim = g_dim or dim
    nnz = int(rp[-1])
    if reorder_mode != "none":
        from hcspmm_tpu.format import reorder as _ro

        perm = {"rcm": _ro.rcm_reorder, "loa": _ro.loa_reorder,
                "cluster": _ro.cluster_reorder}[reorder_mode](rp, ci, nn)
        rp, ci = _ro.apply_permutation(rp, ci, nn, perm)

    t0 = time.perf_counter()
    cfg = PlanConfig(compute_dtype=dtype, impl=impl, band_mode=band,
                     band_impl=band_impl, loi_mode=loi_mode)
    op = HybridSpMM(rp, ci, nn, cfg)
    prep_s = time.perf_counter() - t0

    net = Net(model=model, num_features=dim, hidden=hidden,
              num_classes=classes, num_layers=layers)
    rng = jax.random.PRNGKey(0)
    params = init_net_params(net, rng)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    step = make_train_step(net, op, optimizer)

    import numpy as np

    x = jnp.asarray(np.random.RandomState(0).randn(nn, dim).astype(np.float32))
    if getattr(op, "supports_padded", False):
        x = op.pad_input(x)  # closed padded layout, as train.loop does
    y = jnp.ones(nn, dtype=jnp.int32)
    dur = epoch_time(step, params, opt_state, x, y, rng)
    fwd = forward_time(step, params, x, y, rng)
    rec = {
        "config": name, "model": model, "layers": layers, "hidden": hidden,
        "dim": dim, "nodes": nn, "nnz": nnz, "impl": impl, "dtype": dtype,
        "band": band, "band_impl": band_impl, "reorder": reorder_mode,
        "graph": graph,
        "epoch_ms": round(dur * 1e3, 3),
        # reference Tables VIII/IX split: fwd = forward-only epoch;
        # bwd here = full step (fwd+bwd+Adam) minus fwd
        "fwd_ms": round(fwd * 1e3, 3),
        "bwd_ms": round(max(dur - fwd, 0.0) * 1e3, 3),
        "prep_s": round(prep_s, 3),
        "band_nnz_frac": round(op.plan.band_nnz / max(op.plan.nnz, 1), 3),
        "spill_nnz_frac": round(
            getattr(op.plan, "spill_nnz", 0) / max(op.plan.nnz, 1), 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=str, default="gcn2,gin5")
    p.add_argument("--nodes", type=int, default=65536)
    p.add_argument("--degree", type=float, default=5.0)
    p.add_argument("--block", type=int, default=300)
    p.add_argument("--impl", type=str, default="pallas")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--reorder", type=str, default="rcm")
    p.add_argument("--scale", type=float, default=1.0,
                   help="stand-in graph scale for the baseline configs")
    p.add_argument("--device", type=str, default="auto",
                   choices=["auto", "cpu"],
                   help="cpu forces the host platform (wiring dry-runs; "
                        "the axon plugin ignores JAX_PLATFORMS)")
    args = p.parse_args()

    if args.device == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()
    sc = f"@{args.scale}" if args.scale != 1.0 else ""

    for name in args.configs.split(","):
        if name == "gcn2":
            run_config("gcn2", "gcn", 2, 32, 96, 22, args.nodes, args.degree,
                       args.block, args.impl, args.dtype, "auto", args.reorder)
        elif name == "gin5":
            run_config("gin5", "gin", 5, 64, 96, 22, args.nodes, args.degree,
                       args.block, args.impl, args.dtype, "auto", args.reorder)
        elif name == "loi":
            for band in ("auto", "always", "never"):
                run_config(f"loi-band-{band}", "gcn", 2, 32, 96, 22,
                           args.nodes, args.degree, args.block, args.impl,
                           args.dtype, band, args.reorder)
        # ---- BASELINE.json configs on Table II-matched stand-ins ----
        elif name == "gcn2_arxiv":
            # 2-layer GCN on ogbn-arxiv (BASELINE configs[1]); 40 classes
            run_config("gcn2_arxiv", "gcn", 2, 32, 128, 40, 0, 0, 0,
                       args.impl, args.dtype, "auto", "cluster",
                       graph=f"standin:ARXIV{sc}")
        elif name == "gin5_rd":
            # 5-layer GIN hidden=64 on Reddit (BASELINE configs[2])
            run_config("gin5_rd", "gin", 5, 64, 602, 41, 0, 0, 0,
                       args.impl, args.dtype, "auto", "cluster",
                       graph=f"standin:RD{sc}")
        elif name == "loi_products":
            # LOI threshold ablation on ogbn-products (BASELINE configs[3])
            for band in ("auto", "always", "never"):
                run_config(f"loi_products-band-{band}", "gcn", 2, 32, 100,
                           47, 0, 0, 0, args.impl, args.dtype, band,
                           "cluster", graph=f"standin:PRODUCTS{sc}")
        else:
            print(f"unknown config {name}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
