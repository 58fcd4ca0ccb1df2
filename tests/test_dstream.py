"""Oracle tests for the dst-streamed Pallas spill merge
(kernels/dstream.py) in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcspmm_tpu.kernels import dstream as ds


def _sorted_edges(rng, e, n_rows, n_cols):
    rows = np.sort(rng.randint(0, n_rows, size=e))
    cols = rng.randint(0, n_cols, size=e)
    return rows, cols


def test_build_dstream_layout():
    rng = np.random.RandomState(0)
    mp = 4096
    rows, cols = _sorted_edges(rng, 1000, mp, 2048)
    gcols, local, blk, lt, g = ds.build_dstream(rows, cols, mp, pad_col=2048)
    c = gcols.shape[0] // 128
    s = c // g
    assert c % g == 0 and lt.shape == (c,)
    assert blk.shape == (s,)
    assert local.shape == (-(-s // 8) * 8, g * 128)
    local = local.ravel()[: c * 128].reshape(c, 128)
    # steps' blocks are nondecreasing (consecutive revisits)
    assert (np.diff(blk) >= 0).all()
    valid = local.ravel() < 128
    # global dst per valid slot: block/tile/local recompose to the edge row
    chunk_of_slot = np.repeat(np.arange(c), 128)
    step_of_slot = chunk_of_slot // g
    gdst = (blk[step_of_slot] * g + lt[chunk_of_slot]) * 128 + local.ravel()
    assert (np.sort(gdst[valid]) == rows).all()
    # valid slots' gather cols multiset == input cols (order: dst-sorted)
    assert sorted(gcols[valid]) == sorted(cols)
    # padding slots re-fetch their chunk's first real col (repeat-page
    # gather, near-free) — or pad_col for all-padding group chunks
    gv = gcols.reshape(c, 128)
    first = gv[:, 0]
    padslots = ~valid.reshape(c, 128)
    assert (np.where(padslots, first[:, None], gv) == gv).all()
    # no chunk straddles a 128-row dst tile
    for ci_ in range(c):
        m_ = local[ci_] < 128
        if m_.any():
            t = gdst.reshape(c, 128)[ci_][m_] // 128
            assert (t == t[0]).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("e", [3, 700, 5000])
def test_dstream_merge_oracle(dtype, e):
    rng = np.random.RandomState(1)
    mp, nc, dp = 2048, 1500, 128
    rows, cols = _sorted_edges(rng, e, mp, nc)
    # hub dsts (many edges onto few rows) exercise multi-chunk tiles
    rows[: e // 3] = np.sort(rng.randint(0, 64, size=e // 3))
    rows = np.sort(rows)
    gcols, local, blk, lt, g = ds.build_dstream(rows, cols, mp, pad_col=nc)
    x = rng.randn(nc + 1, dp).astype(np.float32)
    x[nc] = 0.0
    out0 = rng.randn(mp, dp).astype(np.float32)
    xj = jnp.asarray(x).astype(dtype)
    oj = jnp.asarray(out0).astype(dtype)
    got = np.asarray(ds.dstream_merge(
        jnp.asarray(gcols), jnp.asarray(local), jnp.asarray(blk),
        jnp.asarray(lt), xj, oj, group=g)).astype(np.float32)
    ref = np.asarray(oj, np.float32).copy()
    np.add.at(ref, rows, np.asarray(xj, np.float32)[cols])
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < tol
    # untouched blocks keep out0 bit-exactly (alias semantics)
    touched = np.zeros(mp // (g * 128), dtype=bool)
    touched[rows // (g * 128)] = True
    untouched_rows = ~np.repeat(touched, g * 128)
    assert (got[untouched_rows] == np.asarray(oj, np.float32)[untouched_rows]
            ).all()


def test_pick_group():
    assert ds.pick_group(8 * 1024) == 8
    assert ds.pick_group(334928 // 256 * 256 + 256) in (1, 2, 4, 8)
    assert ds.pick_group(256) == 2
    assert ds.pick_group(1024) == 8


def test_empty_spill():
    gcols, local, blk, lt, g = ds.build_dstream(
        np.zeros(0, np.int64), np.zeros(0, np.int64), 1024, pad_col=7)
    x = jnp.zeros((8, 128), jnp.float32)
    out0 = jnp.asarray(np.random.RandomState(0).randn(1024, 128),
                       jnp.float32)
    got = ds.dstream_merge(jnp.asarray(gcols), jnp.asarray(local),
                           jnp.asarray(blk), jnp.asarray(lt), x, out0,
                           group=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out0))


# ---------------- production integration (spill_impl='dstream') ------------


def test_spill_impl_dstream_padded_e2e():
    """HybridSpMM with spill_impl='dstream': plan carries ds_* arrays,
    the padded path routes apply_spill through the streamed merge,
    forward + gradient match the take-path op."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense

    src, dst, n = io.synthetic_powerlaw(900, 5.0, seed=3)
    rp, ci = io.to_csr(src, dst, n)
    kw = dict(loi_mode="intended", impl="pallas", band_h=256,
              band_widths=(256,), band_mode="auto")
    op_t = HybridSpMM(rp, ci, n, PlanConfig(spill_impl="take", **kw))
    op_d = HybridSpMM(rp, ci, n, PlanConfig(
        spill_impl="dstream", ds_kind="tile", **kw))
    assert op_t.plan.spill_nnz > 0
    assert op_d.plan.ds_blk is not None and op_t.plan.ds_blk is None
    assert "ds_blk" in op_d.arrays["f"]
    assert op_d.plan.ds_rows == op_d.plan.padded_rows
    rng = np.random.RandomState(0)
    x = rng.randn(n, 32).astype(np.float32)
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    for op in (op_t, op_d):
        assert op.supports_padded
        xp = op.pad_input(jnp.asarray(x))
        z = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), 32))
        assert np.abs(z - zref).max() / scale < 1e-5

    def loss(op, xp):
        return (op.apply_padded(op.arrays, xp) ** 2).sum()

    g_t = np.asarray(jax.grad(lambda v: loss(op_t, v))(
        op_t.pad_input(jnp.asarray(x))))
    g_d = np.asarray(jax.grad(lambda v: loss(op_d, v))(
        op_d.pad_input(jnp.asarray(x))))
    gs = np.abs(g_t).max() + 1e-9
    assert np.abs(g_t[:n] - g_d[:n]).max() / gs < 1e-5


def test_spill_impl_dstream_shard_plan_falls_back():
    """Shard-uniform (caps) plans must NOT build dstream arrays."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.format.plan import PlanCaps, build_plan
    from hcspmm_tpu.graphs import io

    src, dst, n = io.synthetic_powerlaw(600, 4.0, seed=1)
    rp, ci = io.to_csr(src, dst, n)
    p = build_plan(rp, ci, n, PlanConfig(
        spill_impl="dstream", impl="pallas", band_h=256,
        band_widths=(256,), band_mode="auto"),
        caps=PlanCaps(num_spill_rows=4096, num_spill_edges=8192,
                      band_supers=(8,)))
    assert p.ds_blk is None


def test_dstream_merge_oob_pad_col():
    """Regression: plans where padded_rows == num_nodes pass pad_col ==
    len(xsrc) (out of bounds).  The default jnp.take fill mode gathered
    NaN for the padding slots and 0 * NaN poisoned the one-hot dot —
    the round-2 'ring kernel NaN' was actually this."""
    rng = np.random.RandomState(5)
    mp = 2048
    # concentrate rows in 3 tiles of one destination block so the G-per-
    # step grouping inserts all-padding chunks (the only slots that still
    # carry pad_col now that per-chunk pads re-fetch the chunk's first
    # real col)
    rows = np.sort(rng.randint(0, 384, size=900))
    cols = rng.randint(0, mp, size=900)
    # pad_col == mp == len(x): every group-pad slot gathers out of bounds
    gcols, local, blk, lt, g = ds.build_dstream(rows, cols, mp, pad_col=mp)
    assert (gcols >= mp).any(), "test needs at least one padding chunk"
    x = rng.randn(mp, 128).astype(np.float32)
    out0 = rng.randn(mp, 128).astype(np.float32)
    got = np.asarray(ds.dstream_merge(
        jnp.asarray(gcols), jnp.asarray(local), jnp.asarray(blk),
        jnp.asarray(lt), jnp.asarray(x), jnp.asarray(out0), group=g))
    ref = out0.copy()
    np.add.at(ref, rows, x[cols])
    assert np.isfinite(got).all()
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 1e-5


def test_dstream_ranges_merge_matches_scatter_add():
    """Column-range-blocked layout (build_dstream_ranges): the chained
    per-range merges must equal one global scatter-add."""
    rng = np.random.RandomState(7)
    mp = 4096
    rows, cols = _sorted_edges(rng, 3000, mp, mp)
    rr = 1024
    nr = 4
    gcols, local, blk, lt, g, meta = ds.build_dstream_ranges(
        rows, cols, mp, pad_col=mp, num_ranges=nr, range_rows=rr)
    assert len(meta["r0"]) == nr and len(meta["steps"]) == nr + 1
    x = rng.randn(mp, 128).astype(np.float32)
    out0 = rng.randn(mp, 128).astype(np.float32)

    class _Plan:
        ds_group = g
        ds_meta = meta

    got = np.asarray(ds.dstream_spill(
        dict(ds_gcols=jnp.asarray(gcols), ds_local=jnp.asarray(local),
             ds_blk=jnp.asarray(blk), ds_lt=jnp.asarray(lt)),
        jnp.asarray(x), jnp.asarray(out0), _Plan))
    ref = out0.copy()
    np.add.at(ref, rows, x[cols])
    scale = np.abs(ref).max() + 1e-9
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_dstream_ranges_empty_and_clamped_tail():
    """Ranges with no edges are skipped; the clamped last range (r0 =
    mp - range_rows) rebases correctly; uneven mp/range_rows."""
    rng = np.random.RandomState(8)
    mp = 2048 + 1024  # 3 * 1024, range_rows 2048 -> clamped tail
    rows = np.sort(rng.randint(0, mp, size=500))
    cols = np.concatenate([rng.randint(0, 512, 250),
                           rng.randint(mp - 512, mp, 250)])
    gcols, local, blk, lt, g, meta = ds.build_dstream_ranges(
        rows, cols, mp, pad_col=mp, num_ranges=2, range_rows=2048)
    x = rng.randn(mp, 128).astype(np.float32)
    out0 = np.zeros((mp, 128), np.float32)

    class _Plan:
        ds_group = g
        ds_meta = meta

    got = np.asarray(ds.dstream_spill(
        dict(ds_gcols=jnp.asarray(gcols), ds_local=jnp.asarray(local),
             ds_blk=jnp.asarray(blk), ds_lt=jnp.asarray(lt)),
        jnp.asarray(x), jnp.asarray(out0), _Plan))
    ref = np.zeros_like(out0)
    np.add.at(ref, rows, x[cols])
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 1e-5


def test_blocked_plan_end_to_end_matches_oracle():
    """A plan whose activation table exceeds ds_table_mb builds the
    blocked layout and still matches the dense oracle (interpret)."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense
    from hcspmm_tpu.graphs import io

    src, dst, n = io.synthetic_powerlaw(6000, 4.0, seed=3)
    rp, ci = io.to_csr(src, dst, n)
    cfg = PlanConfig(impl="pallas", band_h=256, band_mode="auto",
                     spill_impl="dstream", compute_dtype="float32",
                     ds_table_mb=1.6, ds_blocked_min_edges=1,
                     ds_kind="tile")
    op = HybridSpMM(rp, ci, n, cfg)
    if op.plan.ds_meta is None:
        pytest.skip("plan routed no edges to dstream spill")
    assert len(op.plan.ds_meta["r0"]) > 1
    x = np.random.RandomState(0).randn(n, 40).astype(np.float32)
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 5e-4


def test_bstream_merge_matches_scatter_add():
    """Block-wide chunks (build_bstream): merge == global scatter-add,
    including multi-chunk blocks and block revisits."""
    rng = np.random.RandomState(11)
    mp = 4096
    rows, cols = _sorted_edges(rng, 2500, mp, mp)
    gcols, local, blk, g = ds.build_bstream(rows, cols, mp, pad_col=mp)
    assert (np.diff(blk) >= 0).all()
    x = rng.randn(mp, 128).astype(np.float32)
    out0 = rng.randn(mp, 128).astype(np.float32)
    got = np.asarray(ds.bstream_merge(
        jnp.asarray(gcols), jnp.asarray(local), jnp.asarray(blk),
        jnp.asarray(x), jnp.asarray(out0), group=g))
    ref = out0.copy()
    np.add.at(ref, rows, x[cols])
    scale = np.abs(ref).max() + 1e-9
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_bstream_low_density_and_oob_pad():
    """Sparse edges (1-2 per block) + pad_col == len(x) (clip mode)."""
    rng = np.random.RandomState(12)
    mp = 8192
    rows = np.sort(rng.choice(mp, size=40, replace=False))
    cols = rng.randint(0, mp, size=40)
    gcols, local, blk, g = ds.build_bstream(rows, cols, mp, pad_col=mp)
    # bstream chunks always hold >=1 real edge, so every pad slot now
    # re-fetches its chunk's first real col: no OOB gathers remain
    assert (gcols < mp).all()
    assert (np.sort(np.unique(gcols)) == np.sort(np.unique(cols))).all()
    x = rng.randn(mp, 128).astype(np.float32)
    out0 = np.zeros((mp, 128), np.float32)
    got = np.asarray(ds.bstream_merge(
        jnp.asarray(gcols), jnp.asarray(local), jnp.asarray(blk),
        jnp.asarray(x), jnp.asarray(out0), group=g))
    ref = np.zeros_like(out0)
    np.add.at(ref, rows, x[cols])
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_bstream_plan_end_to_end_matches_oracle():
    """A low-tile-density plan routes to ds_kind='block' and matches the
    dense oracle end-to-end (interpret)."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense
    from hcspmm_tpu.graphs import io

    src, dst, n = io.synthetic_powerlaw(6000, 4.0, seed=3)
    rp, ci = io.to_csr(src, dst, n)
    cfg = PlanConfig(impl="pallas", band_h=256, band_mode="auto",
                     spill_impl="dstream", compute_dtype="float32",
                     ds_kind="block")
    op = HybridSpMM(rp, ci, n, cfg)
    if op.plan.ds_blk is None or op.plan.ds_kind != "block":
        pytest.skip("plan routed no edges to the block-wide merge")
    x = np.random.RandomState(0).randn(n, 40).astype(np.float32)
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    assert np.abs(z - zref).max() / scale < 5e-4


def test_spill_unique_column_compaction_matches_oracle():
    """Two-level spill gather (plan.ds_ucols): the compact-table path is
    numerically identical to the direct gather (tiny ds_table_mb forces
    compaction on a small graph)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense
    from conftest import small_graph

    # local band edges + a spill population concentrated on 64 far hub
    # columns (small unique-column set = the compaction regime)
    from hcspmm_tpu.graphs import io as _io

    rng = np.random.RandomState(0)
    nn = 4096
    src_l = rng.randint(0, nn, 12000)
    dst_l = (src_l + rng.randint(1, 48, 12000)) % nn
    hubs = rng.choice(nn, 64, replace=False)
    src_h = rng.randint(0, nn, 9000)
    dst_h = hubs[rng.randint(0, 64, 9000)]
    # directed on purpose: only the random->hub direction exists, so
    # the spill's column set is exactly the 64 hubs
    src = np.concatenate([src_l, dst_l, src_h])
    dst = np.concatenate([dst_l, src_l, dst_h])
    rp, ci = _io.to_csr(src, dst, nn)
    # band 384 covers the +-48 local extents, so ONLY the hub edges
    # spill: 64 unique columns against a 2 MB activation table
    cfg = PlanConfig(impl="pallas", compute_dtype="float32",
                     band_widths=(384,), band_mode="auto",
                     ds_table_mb=0.2, ds_blocked_min_edges=0)
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.spill_nnz > 0
    assert op.plan.ds_ucols is not None, (
        "compaction must engage (table above the wall, unique spill "
        "cols far below)")
    x = np.random.RandomState(0).randn(nn, 16).astype(np.float32)
    z = np.asarray(jax.jit(op)(jnp.asarray(x)))
    zref = spmm_reference_dense(rp, ci, nn, x)
    err = np.abs(z - zref).max() / (np.abs(zref).max() + 1e-9)
    assert err < 1e-5, err
