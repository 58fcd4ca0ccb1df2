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


def run_config(name, model, layers, hidden, dim, classes, nodes, degree,
               block, impl, dtype, band, reorder_mode):
    import jax
    import jax.numpy as jnp
    import optax

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.models.net import Net, init_net_params
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.train.loop import make_train_step

    src, dst, nn = io.synthetic_blocks(nodes, degree, block, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    nnz = int(rp[-1])
    if reorder_mode != "none":
        from hcspmm_tpu.format import reorder as _ro

        perm = (_ro.rcm_reorder if reorder_mode == "rcm"
                else _ro.loa_reorder)(rp, ci, nn)
        rp, ci = _ro.apply_permutation(rp, ci, nn, perm)

    t0 = time.perf_counter()
    cfg = PlanConfig(compute_dtype=dtype, impl=impl, band_mode=band)
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
    rec = {
        "config": name, "model": model, "layers": layers, "hidden": hidden,
        "dim": dim, "nodes": nn, "nnz": nnz, "impl": impl, "dtype": dtype,
        "band": band, "reorder": reorder_mode,
        "epoch_ms": round(dur * 1e3, 3),
        "prep_s": round(prep_s, 3),
        "band_nnz_frac": round(op.plan.band_nnz / max(op.plan.nnz, 1), 3),
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
    args = p.parse_args()

    from hcspmm_tpu.train.cli import enable_compile_cache

    enable_compile_cache()

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
        else:
            print(f"unknown config {name}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
