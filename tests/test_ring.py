"""Fetch-once X ring band kernel (kernels/ring_band.py) vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.graphs import io
from hcspmm_tpu.kernels import ring_band as rb
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense


def test_schedule_fetches_every_tile_once_per_epoch():
    rng = np.random.RandomState(0)
    w, slots = 512, 16
    starts = np.sort(rng.randint(0, 200, size=40)).astype(np.int64) * 16
    order, pos, ft, fs, fv, fl = rb.build_ring_schedule(starts, w, slots)
    st = starts[order]
    span = w // 128 + 1
    assert ft.shape == (40, span)
    # every step's window rows [pos, pos+w) map onto ring slots holding
    # exactly the tiles [start//128 .. (start+w-1)//128]
    resident = {}  # slot -> tile
    for s in range(len(st)):
        for k in range(span):
            if fv[s, k]:
                resident[int(fs[s, k])] = int(ft[s, k])
        t0, t1 = st[s] // 128, (st[s] + w - 1) // 128
        off = pos[s] - (pos[s] // 128) * 128
        assert off == st[s] % 128
        for t in range(int(t0), int(t1) + 1):
            slot = (pos[s] // 128) + (t - t0)
            assert resident.get(int(slot)) == t, (s, t, slot)
            assert slot < slots


def test_schedule_rebase_and_late():
    # widely jumping starts force rebases; a tiny ring forces wraps
    starts = np.array([0, 128, 256, 10_000, 10_128, 64, 20_000],
                      dtype=np.int64)
    starts = np.sort(starts) * 1  # already 16-aligned (multiples of 16)
    order, pos, ft, fs, fv, fl = rb.build_ring_schedule(starts, 256, 8)
    assert (pos >= 0).all()
    assert (pos + 256 <= 8 * 128).all()
    # all fetched tiles land in ring bounds
    assert (fs[fv == 1] >= 0).all() and (fs[fv == 1] < 8).all()


def _band_plan(n, src, dst, impl_kw):
    rp, ci = io.to_csr(src, dst, n)
    return HybridSpMM(rp, ci, n, PlanConfig(
        loi_mode="intended", impl="pallas", band_h=256,
        band_mode="auto", **impl_kw)), rp, ci


@pytest.mark.parametrize("graph", ["blocks", "powerlaw"])
def test_ring_padded_matches_wide(graph):
    rng = np.random.RandomState(3)
    n = 2048
    if graph == "blocks":
        src, dst, n = io.synthetic_blocks(n, 4.0, block_size=96, seed=1,
                                          shuffle=False)
        kw = dict(band_widths=(256,))
    else:
        src, dst, n = io.synthetic_powerlaw(n, 5.0, seed=1)
        kw = dict(band_widths=(256,))
    op_w, rp, ci = _band_plan(n, src, dst, dict(band_impl="wide", **kw))
    op_r, _, _ = _band_plan(n, src, dst, dict(band_impl="ring", **kw))
    p = op_r.plan
    assert any(r is not None for r in p.band_ring), "ring schedule missing"
    assert any(f"band{s}_rpos" in op_r.arrays["f"]
               for s in range(len(p.band_widths)))
    x = rng.randn(n, 40).astype(np.float32)
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    for op in (op_w, op_r):
        assert op.supports_padded
        xp = op.pad_input(jnp.asarray(x))
        z = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), 40))
        assert np.abs(z - zref).max() / scale < 1e-5
    # row layout too
    z2 = np.asarray(jax.jit(op_r)(x))
    assert np.abs(z2 - zref).max() / scale < 1e-5


def test_ring_gradient():
    src, dst, n = io.synthetic_blocks(1536, 4.0, block_size=64, seed=2,
                                      shuffle=False)
    op, rp, ci = _band_plan(n, src, dst,
                            dict(band_impl="ring", band_widths=(256,)))
    rng = np.random.RandomState(0)
    x = rng.randn(n, 24).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    g = np.asarray(jax.grad(
        lambda v: (op.apply_padded(op.arrays, v) ** 2).sum())(xp))
    a = np.zeros((n, n), np.float64)
    for r in range(n):
        a[r, ci[rp[r]: rp[r + 1]]] = 1.0
    zd = a @ np.asarray(x, np.float64)
    gref = 2.0 * (a.T @ zd)
    scale = np.abs(gref).max() + 1e-9
    assert np.abs(g[:n, :24] - gref).max() / scale < 1e-5


def test_ring_stress_random_starts():
    """Randomized jumpy supers: many rebases/late fetches; oracle must
    hold (interpret mode models DMA ordering, catching slot races)."""
    rng = np.random.RandomState(7)
    n = 4096
    # clusters scattered across the row space -> jumping band starts
    src, dst = [], []
    for b in range(0, n, 256):
        base = int(rng.randint(0, n - 300))
        for r in range(b, min(b + 256, n)):
            for _ in range(3):
                src.append(r)
                dst.append(base + int(rng.randint(0, 300)))
    rp, ci = io.to_csr(np.array(src), np.array(dst), n)
    op = HybridSpMM(rp, ci, n, PlanConfig(
        loi_mode="intended", impl="pallas", band_h=256,
        band_mode="always", band_widths=(384,), band_impl="ring"))
    assert any(r is not None for r in op.plan.band_ring)
    x = rng.randn(n, 32).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    z = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), 32))
    zref = spmm_reference_dense(rp, ci, n, np.asarray(x))
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 1e-5


def test_ring_two_bucket_ladder():
    """Multi-bucket ring plan: main bucket direct-writes via the ring,
    secondary bucket block-scatters (starts sorted consistently)."""
    rng = np.random.RandomState(11)
    n = 3072
    src, dst = [], []
    for b in range(0, n, 256):
        wide = 500 if (b // 256) % 3 == 0 else 120  # mixed extents
        base = max(0, min(b - 60, n - wide - 1))
        for r in range(b, min(b + 256, n)):
            for _ in range(3):
                src.append(r)
                dst.append(base + int(rng.randint(0, wide)))
    rp, ci = io.to_csr(np.array(src), np.array(dst), n)
    op = HybridSpMM(rp, ci, n, PlanConfig(
        loi_mode="intended", impl="pallas", band_h=256,
        band_mode="always", band_widths=(128, 512), band_impl="ring"))
    p = op.plan
    used = [s for s in range(len(p.band_widths)) if len(p.band_sw_ids[s])]
    assert len(used) == 2, f"want both buckets used, got {used}"
    x = rng.randn(n, 48).astype(np.float32)
    xp = op.pad_input(jnp.asarray(x))
    z = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), 48))
    zref = spmm_reference_dense(rp, ci, n, np.asarray(x))
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 1e-5


def test_ring_fused_training_matches_wide():
    """GCN fused padded layer (gcn_apply_padded) routes through the ring
    fused kernel and matches the wide op bit-for-bit-ish."""
    src, dst, n = io.synthetic_blocks(2048, 4.0, block_size=96, seed=5,
                                      shuffle=False)
    rng = np.random.RandomState(0)
    kw = dict(band_widths=(256,))
    op_w, rp, ci = _band_plan(n, src, dst, dict(band_impl="wide", **kw))
    op_r, _, _ = _band_plan(n, src, dst, dict(band_impl="ring", **kw))
    assert op_r.plan.band_full_cover
    x = rng.randn(n, 32).astype(np.float32)
    w = rng.randn(32, 16).astype(np.float32)
    outs = []
    for op in (op_w, op_r):
        xp = op.pad_input(jnp.asarray(x))
        wp = jnp.pad(jnp.asarray(w), ((0, xp.shape[1] - 32), (0, 112)))
        out = op.gcn_apply_padded(op.arrays, xp, wp)
        gagg = jax.grad(lambda v: (op.gcn_apply_padded(
            op.arrays, v, wp) ** 2).sum())(xp)
        outs.append((np.asarray(out), np.asarray(gagg)))
    for a, b in zip(outs[0], outs[1]):
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / scale < 1e-6
