"""Transposed-band path (config.band_impl='tband', kernels/tband.py).

The dim<=64 fast path: activations carried as X^T [dt, M], each
superwindow computes Y^T[:, R:R+bh] = X^T[:, S:S+W] @ A_t[W, bh]
(reference dim-32/64 kernels, hybrid_all_kernel.cu:1321-1637).

All tests run through the Pallas interpreter on CPU (conftest) and
compare against a dense jnp/NumPy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense

from conftest import small_graph


def _cfg(**kw):
    kw.setdefault("impl", "pallas")
    kw.setdefault("band_impl", "tband")
    kw.setdefault("band_mode", "always")
    kw.setdefault("band_h", 128)
    return PlanConfig(**kw)


def _dense_a(rp, ci, nn):
    a = np.zeros((nn, nn), dtype=np.float32)
    for r in range(nn):
        a[r, ci[rp[r]:rp[r + 1]]] = 1.0
    return a


@pytest.mark.parametrize("pack", [1, 2, 8])
@pytest.mark.parametrize("dim", [32, 20, 7, 96])
def test_tband_spmm_matches_oracle(pack, dim):
    rp, ci, nn = small_graph(300, 6)
    op = HybridSpMM(rp, ci, nn, _cfg(tband_pack=pack))
    assert op.plan.tband and op.plan.tband_pack == pack
    for s in range(len(op.plan.band_widths)):
        st = op.plan.band_starts[s]
        assert (st % 128 == 0).all(), "tband starts must be 128-aligned"
    x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_tband_spill_matches_oracle():
    # long-range edges overflow the placed window -> spill population
    rp, ci, nn = small_graph(500, 8, span=400)
    op = HybridSpMM(rp, ci, nn, _cfg(band_widths=(128,), band_mode="auto"))
    assert op.plan.spill_nnz > 0, "test graph must exercise spill"
    x = np.random.RandomState(1).randn(nn, 16).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_tband_spill_segmented_gather_matches_oracle():
    """Round-5 segmented second level (plan.ts2_segs): tiny wall caps
    force mxgather T1 + destination-segment T2 tables on a small graph;
    the whole chain must still match the dense oracle."""
    rp, ci, nn = small_graph(1400, 9, span=1300)
    cfg = _cfg(band_widths=(128,), band_mode="auto",
               ts_table_mb=1e-3, ts_span=256, ts_k=32,
               ts2_table_mb=48 * 64 / 1e6)  # cap = 48 slots
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.spill_nnz > 0
    assert op.plan.ts_lo is not None, "T1 must be built at this cap"
    assert getattr(op.plan, "ts2_segs", None), "T2 must trigger"
    assert len(op.plan.ts2_segs) > 1, "must actually segment"
    # segment invariants: chunk ranges tile [0, C); per-seg width matches
    cl = len(op.plan.ds_lblk)
    lo = 0
    for s in op.plan.ts2_segs:
        assert s["chunk_lo"] == lo
        lo = s["chunk_hi"]
        assert sum(p[3] for p in s["pieces"]) == s["t2_w"]
        assert sum(p[2] for p in s["parts"]) == s["t2_w"]
    assert lo == cl
    # piece-major schedule covers all ranks exactly once
    assert sum(p[3] for p in op.plan.ts2_pieces) == \
        len(op.plan.ts2_ranks)
    x = np.random.RandomState(3).randn(nn, 16).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_tband_spill_hub_split_matches_oracle():
    """Round-5 hub split: tiny caps + a tiny hub force hot/cold chunk
    streams on a small graph; the two-merge chain must match the
    oracle."""
    rp, ci, nn = small_graph(1400, 9, span=1300)
    cfg = _cfg(band_widths=(128,), band_mode="auto",
               ts_table_mb=1e-3, ts_span=256, ts_k=32,
               ts2_table_mb=48 * 64 / 1e6,
               spill_hub_mb=64 * 64 / 1e6,  # 64-slot hub
               spill_hub_min_cov=0.01, spill_hub_min_reuse=0.0)
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.spill_nnz > 0
    assert op.plan.hub_lo is not None, "hub stream must trigger"
    assert op.plan.ds_h_laneg is not None
    x = np.random.RandomState(4).randn(nn, 16).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_tband_multi_bucket_and_missing_supers():
    # two-width ladder + partial cover (dropped supers ride the spill)
    rp, ci, nn = small_graph(700, 10, span=500)
    op = HybridSpMM(rp, ci, nn, _cfg(band_widths=(128, 256),
                                     band_mode="auto"))
    x = np.random.RandomState(2).randn(nn, 24).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


@pytest.mark.parametrize("pack", [1, 2])
def test_tband_padded_closure(pack):
    """pad_input -> apply_padded (chained) -> unpad_output == A @ (A @ X)."""
    rp, ci, nn = small_graph(300, 6)
    op = HybridSpMM(rp, ci, nn, _cfg(tband_pack=pack))
    assert op.supports_padded
    d = 32
    x = np.random.RandomState(3).randn(nn, d).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    assert xp.shape == (32, op.plan.padded_rows)

    @jax.jit
    def two(arrs, v):
        return op.apply_padded(arrs, op.apply_padded(arrs, v))

    out = np.asarray(op.unpad_output(two(op.arrays, xp), d))
    a = _dense_a(rp, ci, nn)
    zref = a @ (a @ x)
    err = np.abs(out - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_tband_fused_gcn_gin_grads():
    """Fused padded layer cores: values AND grads match the dense oracle."""
    rp, ci, nn = small_graph(300, 6)
    op = HybridSpMM(rp, ci, nn, _cfg())
    assert op._fused_padded is not None
    d, h = 24, 12
    rs = np.random.RandomState(4)
    x = rs.randn(nn, d).astype(np.float32)
    w = rs.randn(d, h).astype(np.float32) * 0.1
    a = _dense_a(rp, ci, nn)
    xp = op.pad_input(jnp.asarray(x))
    wj = jnp.asarray(w)

    def gcn_loss(wm):
        out = op.gcn_apply_padded(op.arrays, xp, wm)
        return (op.unpad_output(out, h) ** 2).sum()

    def gcn_ref(wm):
        return jnp.sum((jnp.asarray(a) @ (jnp.asarray(x) @ wm)) ** 2)

    v, g = jax.value_and_grad(gcn_loss)(wj)
    vr, gr = jax.value_and_grad(gcn_ref)(wj)
    assert np.allclose(float(v), float(vr), rtol=1e-4)
    assert np.allclose(np.asarray(g), np.asarray(gr), rtol=1e-3, atol=1e-2)

    def gin_loss(wm):
        out = op.gin_apply_padded(op.arrays, xp, wm)
        return (op.unpad_output(out, h) ** 2).sum()

    def gin_ref(wm):
        return jnp.sum(((jnp.asarray(a) @ jnp.asarray(x)) @ wm) ** 2)

    v, g = jax.value_and_grad(gin_loss)(wj)
    vr, gr = jax.value_and_grad(gin_ref)(wj)
    assert np.allclose(float(v), float(vr), rtol=1e-4)
    assert np.allclose(np.asarray(g), np.asarray(gr), rtol=1e-3, atol=1e-2)


def test_tband_input_grad():
    """d/dX through the padded tband op (custom_vjp, symmetric plan)."""
    rp, ci, nn = small_graph(200, 5)
    op = HybridSpMM(rp, ci, nn, _cfg())
    d = 16
    x = np.random.RandomState(5).randn(nn, d).astype(np.float32)
    a = _dense_a(rp, ci, nn)

    def loss(xv):
        out = op.apply_padded(op.arrays, op.pad_input(xv))
        return (op.unpad_output(out, d) ** 2).sum()

    def ref(xv):
        return jnp.sum((jnp.asarray(a) @ xv) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    gr = jax.grad(ref)(jnp.asarray(x))
    assert np.allclose(np.asarray(g), np.asarray(gr), rtol=1e-3, atol=1e-2)


def test_tband_normalized_and_mean():
    rp, ci, nn = small_graph(200, 5)
    op = HybridSpMM(rp, ci, nn, _cfg(), normalize=True)
    d = 8
    x = np.random.RandomState(6).randn(nn, d).astype(np.float32)
    a = _dense_a(rp, ci, nn)
    deg = np.maximum(a.sum(1), 1.0)
    xp = op.pad_input(jnp.asarray(x))
    out = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), d))
    zref = (a @ (x / np.sqrt(deg)[:, None])) / np.sqrt(deg)[:, None]
    assert np.allclose(out, zref, rtol=1e-4, atol=1e-4)
    outm = np.asarray(op.unpad_output(
        op.mean_apply_padded(op.arrays, xp), d))
    zm = (a @ x) / deg[:, None]
    assert np.allclose(outm, zm, rtol=1e-4, atol=1e-4)


def test_tband_training_step_runs():
    """2-layer GCN + GIN train a few epochs in the transposed layout."""
    from hcspmm_tpu.models.net import Net
    from hcspmm_tpu.train.loop import train

    rp, ci, nn = small_graph(300, 6)
    op = HybridSpMM(rp, ci, nn, _cfg())
    x = np.random.RandomState(7).randn(nn, 16).astype(np.float32)
    y = np.ones(nn, dtype=np.int32)
    for model in ("gcn", "gin"):
        net = Net(model=model, num_features=16, hidden=8, num_classes=4,
                  num_layers=2)
        res = train(net, op, x, y, epochs=3, warmup_epochs=1, scan_chunk=1)
        assert np.isfinite(res["final_loss"]), (model, res["final_loss"])


def test_tband_rejects_bad_configs():
    rp, ci, nn = small_graph(100, 5)
    with pytest.raises(ValueError):
        HybridSpMM(rp, ci, nn, _cfg(impl="xla"))
    with pytest.raises(ValueError):
        HybridSpMM(rp, ci, nn, _cfg(band_h=96))
    with pytest.raises(ValueError):
        HybridSpMM(rp, ci, nn, _cfg(tband_pack=3))


def test_tband_never_routes_windows_dense():
    """Round-5 regression (parity PT+rcm candidate): spill-mode three-way
    routing marked some windows dense on a tband plan, but the transposed
    path applies band + spill ONLY — those windows' edges were silently
    dropped (0.51 rel err at PT@1.0).  tband plans must carry every
    non-band edge in the spill population."""
    rp, ci, nn = small_graph(600, 10, span=500)
    op = HybridSpMM(rp, ci, nn, _cfg(band_widths=(128,), band_mode="auto",
                                     loi_mode="calibrated"))
    assert op.plan.tband
    assert op.plan.dense_nnz == 0 and op.plan.sparse_nnz == 0
    assert op.plan.band_nnz + op.plan.spill_nnz == int(rp[-1])
    x = np.random.RandomState(3).randn(nn, 32).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_padded_layout_matches_fallback_support():
    """Round-5 regression: when a tband op lacks the padded fast path,
    ``pad_input`` must emit the ROW layout the unpadded fallback consumes
    (mixing layouts fed [dt, M] to the [N, d] op -> square-pad blow-up)."""
    rp, ci, nn = small_graph(300, 6)
    op = HybridSpMM(rp, ci, nn, _cfg())
    x = np.random.RandomState(5).randn(nn, 16).astype(np.float32)
    zref = spmm_reference_dense(rp, ci, nn, x)

    # force the fallback: simulate a plan without the padded fast path
    op._fn_padded = None
    assert not op.supports_padded and not op._padded_transposed
    xp = op.pad_input(jnp.asarray(x))
    assert xp.shape[0] == op.plan.padded_rows, "row layout expected"
    out = np.asarray(op.unpad_output(
        op.apply_padded(op.arrays, xp), d=16, dtype=jnp.float32))
    err = np.abs(out - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"
