"""Narrow-dim FOLDED activation layout (config.band_fold, VERDICT r1 #2).

The folded layout packs ``fold`` consecutive rows into one 128-lane VMEM
row (dsub = 128/fold lanes each), so dim<=32/64 workloads stop paying the
128-lane floor: X and output band traffic shrink fold-x while the A
stream is unchanged (reference dim-32 fast path, .cu:1321-1476).

All tests run through the Pallas interpreter on CPU (conftest) and
compare against a dense jnp oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense

from conftest import small_graph


def _cfg(fold, **kw):
    kw.setdefault("impl", "pallas")
    kw.setdefault("band_mode", "always")
    kw.setdefault("band_h", 64)
    return PlanConfig(band_fold=fold, **kw)


def _dense_a(rp, ci, nn):
    a = np.zeros((nn, nn), dtype=np.float32)
    for r in range(nn):
        a[r, ci[rp[r]:rp[r + 1]]] = 1.0
    return a


@pytest.mark.parametrize("fold", [2, 4])
@pytest.mark.parametrize("dim", [32, 20, 7])
def test_fold_spmm_matches_oracle(fold, dim):
    if dim > 128 // fold:
        pytest.skip("dim exceeds folded lane budget")
    rp, ci, nn = small_graph(100, 6)
    op = HybridSpMM(rp, ci, nn, _cfg(fold))
    assert op.plan.band_fold == fold
    x = np.random.RandomState(0).randn(nn, dim).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_fold_spill_population_matches_oracle():
    # long-range edges force spill (the placed band cannot cover the
    # super's full extent at width 128)
    rp, ci, nn = small_graph(220, 8, span=200)
    op = HybridSpMM(rp, ci, nn, _cfg(4, band_widths=(128,)))
    assert op.plan.spill_nnz > 0, "test graph must exercise spill"
    x = np.random.RandomState(1).randn(nn, 16).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_fold_padded_layout_closed_chain():
    rp, ci, nn = small_graph(100, 5)
    op = HybridSpMM(rp, ci, nn, _cfg(4))
    assert op.supports_padded
    dim = 24
    x = np.random.RandomState(2).randn(nn, dim).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    assert xp.shape == (op.plan.padded_rows // 4, 128)

    @jax.jit
    def chain2(arrs, v):
        return op.apply_padded(arrs, op.apply_padded(arrs, v))

    z = np.asarray(op.unpad_output(chain2(op.arrays, xp), dim))
    a = _dense_a(rp, ci, nn)
    zref = a @ (a @ x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


@pytest.mark.parametrize("model", ["gcn", "gin"])
def test_fold_fused_layer_grads_match_dense(model):
    rp, ci, nn = small_graph(100, 6)
    din, dout = 20, 12
    op = HybridSpMM(rp, ci, nn, _cfg(4))
    assert op._fused_padded is not None
    rng = np.random.RandomState(3)
    x = rng.randn(nn, din).astype(np.float32)
    w0 = rng.randn(din, dout).astype(np.float32)
    a = _dense_a(rp, ci, nn)
    fused = op._fused_padded[model]

    def loss_fold(w):
        xp = op.pad_input(jnp.asarray(x))
        out = fused(op.arrays["f"], op.arrays["b"], xp, w)
        return jnp.sum(op.unpad_output(out, dout) ** 2)

    def loss_ref(w):
        ad = jnp.asarray(a)
        xd = jnp.asarray(x)
        if model == "gcn":
            z = ad @ (xd @ w)
        else:
            z = (ad @ xd) @ w
        return jnp.sum(z ** 2)

    v_f, g_f = jax.value_and_grad(loss_fold)(jnp.asarray(w0))
    v_r, g_r = jax.value_and_grad(loss_ref)(jnp.asarray(w0))
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-3, atol=1e-3)


def test_fold_fused_x_grad_matches_dense():
    rp, ci, nn = small_graph(100, 6)
    din, dout = 24, 16
    op = HybridSpMM(rp, ci, nn, _cfg(4))
    rng = np.random.RandomState(4)
    x = rng.randn(nn, din).astype(np.float32)
    w = jnp.asarray(rng.randn(din, dout).astype(np.float32))
    a = _dense_a(rp, ci, nn)

    def loss_fold(xv):
        xp = op.pad_input(xv)
        out = op._fused_padded["gcn"](op.arrays["f"], op.arrays["b"], xp, w)
        return jnp.sum(op.unpad_output(out, dout) ** 2)

    def loss_ref(xv):
        return jnp.sum((jnp.asarray(a) @ (xv @ w)) ** 2)

    g_f = jax.grad(loss_fold)(jnp.asarray(x))
    g_r = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("model", ["gcn", "gin", "sage"])
def test_fold_training_smoke(model):
    from hcspmm_tpu.models.net import Net
    from hcspmm_tpu.train.loop import train

    rp, ci, nn = small_graph(120, 5)
    op = HybridSpMM(rp, ci, nn, _cfg(4))
    dim, hidden, classes = 16, 24, 8
    net = Net(model=model, num_features=dim, hidden=hidden,
              num_classes=classes, num_layers=2)
    x = np.random.RandomState(5).randn(nn, dim).astype(np.float32)
    y = np.ones(nn, dtype=np.int32)
    res = train(net, op, x, y, epochs=3, warmup_epochs=0, scan_chunk=1)
    assert np.isfinite(res["final_loss"])


def test_fold_mean_apply_padded_matches_oracle():
    rp, ci, nn = small_graph(90, 4)
    op = HybridSpMM(rp, ci, nn, _cfg(2))
    dim = 40
    x = np.random.RandomState(6).randn(nn, dim).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    z = np.asarray(op.unpad_output(
        jax.jit(op.mean_apply_padded)(op.arrays, xp), dim))
    a = _dense_a(rp, ci, nn)
    deg = np.maximum(a.sum(axis=1, keepdims=True), 1.0)
    zref = (a @ x) / deg
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, f"rel err {err}"


def test_fold_validation_errors():
    # n >= 128 so padded rows cover the minimum (128) band width — the
    # folded layout needs M >= W for the padded-clamp invariant
    rp, ci, nn = small_graph(130, 4)
    from hcspmm_tpu.format.plan import build_plan

    with pytest.raises(ValueError, match="band_fold"):
        build_plan(rp, ci, nn, PlanConfig(impl="pallas", band_fold=3))
    with pytest.raises(ValueError, match="pallas"):
        build_plan(rp, ci, nn, PlanConfig(impl="xla", band_fold=2))
    with pytest.raises(ValueError, match="band_h"):
        build_plan(rp, ci, nn, _cfg(4, band_h=48))
    op = HybridSpMM(rp, ci, nn, _cfg(4))
    with pytest.raises(ValueError, match="dim"):
        op.pad_input(jnp.zeros((nn, 64)))  # 64 > 128/4
