#!/usr/bin/env python
"""Real-graph rows for PARITY.md (VERDICT r4 #3): run NON-synthetic
graphs end-to-end on the TPU — plan build, SpMM bench, 2-layer GCN
epoch — with a dense-oracle correctness check on the same device.

Graphs (graphs/real.py; zero-egress rig, so real data comes from
libraries baked into the image + committed reference-format text):

  digits-knn : scikit-learn's real handwritten digits (1,797 nodes,
               REAL 64-dim pixel features, REAL 10-class labels), 8-NN
               graph — a real dataset end-to-end.
  lesmis     : Les Miserables co-occurrence (committed at
               data/lesmis_A.txt in the reference's "dst,src" 1-indexed
               text format, loaded through io.load_edges_any —
               dataset.py:46-61 semantics).
  karate     : Zachary's karate club, same path.

Rows carry ``real: true`` and go to artifacts/parity_real_r5.jsonl.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def _measure_spmm(rp, ci, nn, dim, x_feat=None):
    import jax
    import jax.numpy as jnp

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense
    from hcspmm_tpu.models.sag import chained_apply_time

    nnz = int(rp[-1])
    t0 = time.perf_counter()
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl="tband",
        loi_mode="calibrated"))
    prep_s = time.perf_counter() - t0
    if x_feat is None:
        x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    else:
        x = x_feat[:, :dim].astype(np.float32)
        if x.shape[1] < dim:
            x = np.pad(x, ((0, 0), (0, dim - x.shape[1])))
    # on-device result vs dense oracle (bf16 tolerance)
    z = np.asarray(jax.jit(op)(jnp.asarray(x).astype(jnp.bfloat16)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = float(np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9))

    class _P:
        arrays = op.arrays

        @staticmethod
        def apply(a, v):
            return op.apply_padded(a, v)

    xp = op.pad_input(jnp.asarray(x).astype(jnp.bfloat16))
    kd = int(min(512, max(32, 4_000_000 // max(nnz, 1))))
    ts = sorted(chained_apply_time(_P, xp, k1=2, k2=2 + kd, trials=3)
                for _ in range(3))
    return op, ts, prep_s, err


def _epoch(rp, ci, nn, dim, classes, x_feat, y):
    """2-layer GCN on the REAL features/labels: measured epoch time
    (tools/bench_train pattern) plus train-accuracy after 30 epochs —
    real supervised learning end-to-end on the TPU."""
    import jax
    import jax.numpy as jnp
    import optax

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.models.net import Net, init_net_params
    from hcspmm_tpu.ops.spmm import HybridSpMM
    from hcspmm_tpu.train.loop import make_train_step
    from tools.bench_train import epoch_time, forward_time

    t0 = time.perf_counter()
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_impl="tband",
        loi_mode="calibrated"))
    prep_s = time.perf_counter() - t0
    net = Net(model="gcn", num_features=dim, hidden=32,
              num_classes=classes, num_layers=2)
    rng = jax.random.PRNGKey(0)
    params = init_net_params(net, rng)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    step = make_train_step(net, op, optimizer)
    xf = x_feat[:, :dim].astype(np.float32)
    if xf.shape[1] < dim:
        xf = np.pad(xf, ((0, 0), (0, dim - xf.shape[1])))
    # standardize the real pixel features (the reference uses randn;
    # real features need scaling for Adam lr=0.01 to behave)
    xf = (xf - xf.mean(0)) / (xf.std(0) + 1e-6)
    x = jnp.asarray(xf)
    if getattr(op, "supports_padded", False):
        x = op.pad_input(x)
    yj = jnp.asarray(y.astype(np.int32))
    dur = epoch_time(step, params, opt_state, x, yj, rng)
    fwd = forward_time(step, params, x, yj, rng)
    # short real training run: does accuracy move on real labels?
    p, s = params, opt_state
    for _ in range(30):
        p, s, loss = step(p, s, x, yj, rng)
    from hcspmm_tpu.models.net import net_forward

    class _B:  # minimal train.loop._Bound mirror for inference
        padded_layout = getattr(op, "supports_padded", False)

        def __call__(self, xx):
            return op.apply_padded(op.arrays, xx)

        def gcn_fused(self, xx, w):
            return op.gcn_apply_padded(op.arrays, xx, w)

        def gin_fused(self, xx, w):
            return op.gin_apply_padded(op.arrays, xx, w)

        def dense(self, xx, w):
            return op.dense_padded(xx, w)

        def pad_weight(self, w, xx):
            return op.pad_weight(w, xx)

    logp = net_forward(net, p, _B(), x, train=False,
                       out_slice=lambda h: op.unpad_output(h, classes))
    acc = float((jnp.argmax(logp, -1) == yj).mean())
    return dict(config="real_gcn2", model="gcn", layers=2, hidden=32,
                dim=dim, nodes=nn, nnz=int(rp[-1]),
                epoch_ms=round(dur * 1e3, 3),
                fwd_ms=round(fwd * 1e3, 3),
                bwd_ms=round(max(dur - fwd, 0) * 1e3, 3),
                final_loss=round(float(loss), 4),
                train_acc_30ep=round(acc, 4),
                prep_s=round(prep_s, 2))


def main() -> int:
    from hcspmm_tpu.train.cli import enable_compile_cache
    from hcspmm_tpu.graphs import io, real

    enable_compile_cache()
    out = []

    # --- digits-knn: real features + labels ---
    src, dst, nn, xf, y = real.digits_knn(k=8)
    rp, ci = io.to_csr(src, dst, nn)
    op, ts, prep_s, err = _measure_spmm(rp, ci, nn, 64, x_feat=xf)
    nnz = int(rp[-1])
    rec = dict(real=True, graph="digits-knn", nodes=nn, nnz=nnz, dim=64,
               spmm_us=round(ts[1] * 1e6, 2),
               all_us=[round(t * 1e6, 2) for t in ts],
               gnnz_s=round(nnz / ts[1] / 1e9, 4),
               oracle_rel_err=round(err, 6), prep_s=round(prep_s, 2),
               band_frac=round(op.plan.band_nnz / nnz, 3),
               spill_frac=round(getattr(op.plan, "spill_nnz", 0) / nnz, 3))
    print(json.dumps(rec), flush=True)
    out.append(rec)

    # --- committed reference-format text files (real graphs) ---
    for name in ("lesmis", "karate"):
        path = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "data", f"{name}_A.txt")
        src, dst, nn = io.load_edges_any(path)
        rp, ci = io.to_csr(src, dst, nn)
        op, ts, prep_s, err = _measure_spmm(rp, ci, nn, 32)
        nnz = int(rp[-1])
        rec = dict(real=True, graph=name, nodes=nn, nnz=nnz, dim=32,
                   spmm_us=round(ts[1] * 1e6, 2),
                   all_us=[round(t * 1e6, 2) for t in ts],
                   gnnz_s=round(nnz / ts[1] / 1e9, 4),
                   oracle_rel_err=round(err, 6),
                   prep_s=round(prep_s, 2),
                   band_frac=round(op.plan.band_nnz / nnz, 3),
                   spill_frac=round(
                       getattr(op.plan, "spill_nnz", 0) / nnz, 3))
        print(json.dumps(rec), flush=True)
        out.append(rec)

    # --- digits-knn 2-layer GCN training epoch, real labels ---
    src, dst, nn, xf, y = real.digits_knn(k=8)
    rp, ci = io.to_csr(src, dst, nn)
    erec = _epoch(rp, ci, nn, 64, 10, xf, y)
    erec.update(real=True, graph="digits-knn")
    print(json.dumps(erec), flush=True)
    out.append(erec)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
