"""Band+spill (PlanConfig.band_spill='auto') vs dense oracle.

The reference's headline graphs are power-law (report §V-B: only 15-22%
of row windows are TC-suitable); the robust band-window placement keeps
the streamed band path on the local mass and spills hub/long-range edges
to an additive segment-sum population.  These tests pin correctness of
that split on genuinely non-bandable graphs across every impl, layout,
and the fused/differentiated forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.graphs import io
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense


def powerlaw_graph(n=700, deg=5.0, seed=0):
    src, dst, nn = io.synthetic_powerlaw(n, deg, seed=seed)
    rp, ci = io.to_csr(src, dst, nn)
    return rp, ci, nn


def check(rp, ci, nn, dim, cfg, tol=1e-5, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(nn, dim).astype(np.float32)
    op = HybridSpMM(rp, ci, nn, cfg)
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, nn, x)
    scale = np.abs(zref).max() + 1e-9
    err = np.abs(z - zref).max() / scale
    assert err < tol, f"rel err {err}"
    return op


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("dim", [24, 96])
def test_powerlaw_spill_matches_oracle(impl, dim):
    rp, ci, nn = powerlaw_graph()
    cfg = PlanConfig(impl=impl, band_mode="always", band_h=64,
                     band_widths=(128,), band_spill="auto")
    op = check(rp, ci, nn, dim, cfg)
    # a 128-wide band cannot cover a Chung-Lu graph; edges must spill
    assert op.plan.has_spill and op.plan.spill_nnz > 0
    assert op.plan.band_nnz > 0
    assert op.plan.nnz == (op.plan.band_nnz + op.plan.spill_nnz
                           + op.plan.dense_nnz + op.plan.sparse_nnz)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_powerlaw_auto_width_spill(impl):
    """band_widths='auto' in spill mode resolves a width from the robust
    coverage quantiles and still matches the oracle."""
    rp, ci, nn = powerlaw_graph(600, 4.0, seed=2)
    cfg = PlanConfig(impl=impl, band_mode="auto", band_h=64,
                     band_widths="auto", band_spill="auto")
    check(rp, ci, nn, 17, cfg)


def test_spill_never_restores_strict_selection():
    """band_spill='never' must reproduce the round-1 all-or-nothing
    extent selection: no spill population on any graph."""
    rp, ci, nn = powerlaw_graph(500, 4.0, seed=1)
    cfg = PlanConfig(band_mode="auto", band_h=64, band_widths=(128, 256),
                     band_spill="never")
    op = check(rp, ci, nn, 8, cfg)
    assert not op.plan.has_spill


def test_spill_gradient_matches_dense():
    rp, ci, nn = powerlaw_graph(400, 4.0, seed=3)
    cfg = PlanConfig(impl="pallas", band_mode="always", band_h=64,
                     band_widths=(128,), band_spill="auto")
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.has_spill
    x = jnp.asarray(np.random.RandomState(1).randn(nn, 16).astype(np.float32))
    g = np.asarray(jax.grad(lambda v: (op(v) ** 2).sum())(x))
    a = np.zeros((nn, nn), np.float64)
    for r in range(nn):
        a[r, ci[rp[r]: rp[r + 1]]] = 1.0
    z = a @ np.asarray(x, np.float64)
    gref = 2.0 * (a.T @ z)
    scale = np.abs(gref).max() + 1e-9
    assert np.abs(g - gref).max() / scale < 1e-5


def test_spill_padded_layout_closed():
    """Padded layout with spill: pad -> apply_padded -> unpad matches the
    oracle (spill rows are global padded rows; padding rows stay zero)."""
    rp, ci, nn = powerlaw_graph(640, 5.0, seed=4)
    cfg = PlanConfig(impl="pallas", band_mode="always", band_h=64,
                     band_widths=(128,), band_spill="auto")
    op = HybridSpMM(rp, ci, nn, cfg)
    if not op.supports_padded:
        pytest.skip("plan not padded-capable on this graph")
    assert op.plan.has_spill
    rng = np.random.RandomState(0)
    x = rng.randn(nn, 24).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    out = op.apply_padded(op.arrays, xp)
    # closed layout: rows >= nn stay exactly zero so chaining is valid
    if out.shape[0] > nn:
        assert np.abs(np.asarray(out[nn:])).max() == 0.0
    z = np.asarray(op.unpad_output(out, 24))
    zref = spmm_reference_dense(rp, ci, nn, x)
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 1e-5


@pytest.mark.parametrize("layer", ["gcn", "gin"])
def test_spill_fused_ops_match_composed(layer):
    """Fused layer ops under spill: the fused kernel's output is
    corrected on the spill rows; must equal compose(spmm, matmul)."""
    rp, ci, nn = powerlaw_graph(512, 4.0, seed=5)
    cfg = PlanConfig(impl="pallas", band_mode="always", band_h=64,
                     band_widths=(128,), band_spill="auto")
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.has_spill
    rng = np.random.RandomState(2)
    d, h = 16, 12
    x = jnp.asarray(rng.randn(nn, d).astype(np.float32))
    w = jnp.asarray(rng.randn(d, h).astype(np.float32))
    a = np.zeros((nn, nn), np.float64)
    for r in range(nn):
        a[r, ci[rp[r]: rp[r + 1]]] = 1.0
    if layer == "gcn":
        out = op.gcn_apply(op.arrays, x, w)
        ref = a @ (np.asarray(x, np.float64) @ np.asarray(w, np.float64))
    else:
        out = op.gin_apply(op.arrays, x, w)
        ref = (a @ np.asarray(x, np.float64)) @ np.asarray(w, np.float64)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(np.asarray(out) - ref).max() / scale < 1e-4

    # fused backward with spill correction vs dense grads
    def loss(xw):
        xx, ww = xw
        f = op.gcn_apply if layer == "gcn" else op.gin_apply
        return (f(op.arrays, xx, ww) ** 2).sum()

    gx, gw = jax.grad(loss)((x, w))
    zref = ref
    gz = 2.0 * zref
    if layer == "gcn":
        gx_ref = (a.T @ gz) @ np.asarray(w, np.float64).T
        gw_ref = np.asarray(x, np.float64).T @ (a.T @ gz)
    else:
        gx_ref = a.T @ (gz @ np.asarray(w, np.float64).T)
        gw_ref = (a @ np.asarray(x, np.float64)).T @ gz
    for got, ref_ in ((gx, gx_ref), (gw, gw_ref)):
        scale = np.abs(ref_).max() + 1e-9
        assert np.abs(np.asarray(got) - ref_).max() / scale < 1e-4


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_bucket_windows_inside_banded_supers(impl):
    """Per-window routing (format.plan pass 1): TC-suitable windows whose
    columns sit far outside the placed band window route to the dense
    buckets while sibling windows stay banded, and the merged output
    matches the dense oracle exactly (choice exercised: band + bucket +
    spill in one plan)."""
    rng = np.random.RandomState(0)
    n = 2048
    src, dst = [], []
    for s in range(0, n, 256):
        base = (s * 2897) % (n - 128)
        far = np.arange(base, base + 24)
        for w in range(0, 128, 16):
            for r in range(s + w, s + w + 16):
                cols = rng.choice(far, size=12, replace=False)
                src.extend([r] * 12)
                dst.extend(cols)
        for r in range(s + 128, min(s + 256, n)):
            cols = s + 128 + rng.randint(0, 128, size=6)
            src.extend([r] * 6)
            dst.extend(cols)
    rp, ci = io.to_csr(np.array(src), np.array(dst), n)
    # glue_passes=0: pure marginal-cost routing — at this tiny scale the
    # layout-aware collective threshold (config.glue_passes) would keep
    # everything banded, and this test exists to exercise the merged
    # band+bucket+spill plan
    cfg = PlanConfig(loi_mode="all_dense", impl=impl, band_mode="auto",
                     band_h=256, band_widths=(256,), glue_passes=0.0)
    op = HybridSpMM(rp, ci, n, cfg)
    p = op.plan
    assert p.band_nnz > 0 and p.dense_nnz > 0, (p.band_nnz, p.dense_nnz)
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    ref = spmm_reference_dense(rp, ci, n, np.asarray(x))
    out = np.asarray(op.apply(op.arrays, x))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 1e-5


def test_partial_cover_padded_layout():
    """A dropped superwindow (band unprofitable) does NOT forfeit the
    closed padded layout: its edges ride the spill population, its output
    block zeroes, and pad -> apply_padded -> unpad matches the oracle —
    the round-2 partial-cover rule (kernels.block_spmm
    spmm_padded_supported / spmm_pallas_padded)."""
    rng = np.random.RandomState(1)
    n = 2048
    src, dst = [], []
    # supers 0..6: tight local bands (clearly profitable)
    for s in range(0, 1792, 256):
        for r in range(s, s + 256):
            cols = s + rng.randint(0, 128, size=6)
            src.extend([r] * 6)
            dst.extend(cols)
    # super 7: two scattered edges (band unprofitable on margin)
    for r in range(1792, 2048, 128):
        src.append(r)
        dst.append(int(rng.randint(0, n)))
    # symmetrize (dedup): the default backward reuses untransposed A
    pairs = np.unique(np.stack(
        [np.concatenate([src, dst]), np.concatenate([dst, src])], 1), axis=0)
    rp, ci = io.to_csr(pairs[:, 0], pairs[:, 1], n)
    op = HybridSpMM(rp, ci, n, PlanConfig(
        loi_mode="intended", impl="pallas", band_mode="auto",
        band_h=256, band_widths=(512,)))
    p = op.plan
    assert not p.band_full_cover, "super 7 should drop to spill"
    # super 7 drops to spill; supers >= ceil(n/bh) are the planner's
    # 16-multiple round-up pads (format.plan) — also missing by design
    real_sw = (n + 255) // 256
    mm = set(int(v) for v in p.band_missing_sw)
    assert 7 in mm and all(v == 7 or v >= real_sw for v in mm)
    assert p.sparse_nnz == 0, "spill-mode routing is total"
    assert op.supports_padded, "partial cover must keep the padded path"
    x = rng.randn(n, 24).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    out = op.apply_padded(op.arrays, xp)
    z = np.asarray(op.unpad_output(out, 24))
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 1e-5
    # gradient through the partial-cover padded op
    g = np.asarray(jax.grad(
        lambda v: (op.apply_padded(op.arrays, v) ** 2).sum())(xp))
    a = np.zeros((n, n), np.float64)
    for r in range(n):
        a[r, ci[rp[r]: rp[r + 1]]] = 1.0
    zd = a @ np.asarray(x, np.float64)
    gref = 2.0 * (a.T @ zd)
    scale = np.abs(gref).max() + 1e-9
    assert np.abs(g[:n, :24] - gref).max() / scale < 1e-5
