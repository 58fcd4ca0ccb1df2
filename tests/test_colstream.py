"""Oracle tests for the column-streamed MXU spill gather
(kernels/colstream.py) in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcspmm_tpu.kernels import colstream as cs


def _rand_edges(rng, e, n_rows, n_cols):
    cols = rng.randint(0, n_cols, size=e)
    rows = rng.randint(0, n_rows, size=e)
    return cols, rows


def test_build_colstream_layout():
    rng = np.random.RandomState(0)
    cols, rows = _rand_edges(rng, 1000, 2048, 4096)
    tb, cl, rf = cs.build_colstream(cols, rows, group=8)
    assert tb.shape[0] % 8 == 0
    assert cl.shape == (tb.shape[0], 128)
    assert rf.shape == (tb.shape[0] * 128,)
    # every chunk: 128-aligned base, single tile, local cols in range
    valid = cl < 128
    assert (tb % 128 == 0).all()
    glob = tb[:, None] + cl  # global col per slot (valid slots)
    order = np.argsort(cols, kind="stable")
    # multiset of valid (global col, row) pairs == input edges
    got = np.stack([glob.ravel()[rf < np.iinfo(np.int32).max],
                    rf[rf < np.iinfo(np.int32).max]], axis=1)
    want = np.stack([cols[order], rows[order]], axis=1)
    assert got.shape == want.shape
    assert (np.sort(got.view("i8,i8") if got.dtype == np.int64 else got, 0)
            == np.sort(want, 0)).all() or True  # order check below
    # chunks are emitted in column-sorted edge order with in-chunk slots
    # dense-first: flattened valid entries reproduce the sorted edges
    assert (got[:, 0] == cols[order]).all()
    assert (got[:, 1] == rows[order]).all()
    # padding slots carry the sentinel
    assert (cl[~valid] == 128).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("e", [5, 900, 4097])
def test_colstream_gather_oracle(dtype, e):
    rng = np.random.RandomState(1)
    n_cols = 2048
    cols, rows = _rand_edges(rng, e, 1024, n_cols)
    # skew towards hub columns (power-law-ish multiplicity)
    cols[: e // 3] = rng.randint(0, 64, size=e // 3)
    tb, cl, rf = cs.build_colstream(cols, rows, group=8)
    x = rng.randn(n_cols, 128).astype(np.float32)
    xp = jnp.asarray(x).astype(dtype)
    g = np.asarray(cs.colstream_gather(jnp.asarray(tb), jnp.asarray(cl),
                                       xp, group=8))
    order = np.argsort(cols, kind="stable")
    ref = np.asarray(xp, np.float32)[cols[order]]
    mask = rf < np.iinfo(np.int32).max
    assert g.shape == (tb.shape[0] * 128, 128)
    np.testing.assert_allclose(g[mask], ref, rtol=0, atol=0)
    # padded slots gather exact zeros
    assert (g[~mask] == 0).all()


def test_colstream_spill_matches_take_path():
    """colstream_spill == the production take+segment_sum+scatter path."""
    rng = np.random.RandomState(2)
    n, e = 1536, 2000
    cols, rows = _rand_edges(rng, e, n, n)
    x = rng.randn(n, 128).astype(np.float32)
    out0 = rng.randn(n, 128).astype(np.float32)
    tb, cl, rf = cs.build_colstream(cols, rows, group=8)
    got = np.asarray(cs.colstream_spill(
        jnp.asarray(tb), jnp.asarray(cl), jnp.asarray(rf),
        jnp.asarray(x), jnp.asarray(out0), group=8))
    ref = out0.copy()
    np.add.at(ref, rows, x[cols])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


# ---------------- production integration (spill_impl='colstream') ----------


def test_spill_impl_colstream_padded_e2e():
    """HybridSpMM with spill_impl='colstream': plan carries the cs_*
    arrays, the padded path routes apply_spill through the streamed
    kernel, forward + gradient match the take-path op exactly-ish."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.graphs import io
    from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense

    src, dst, n = io.synthetic_powerlaw(900, 5.0, seed=3)
    rp, ci = io.to_csr(src, dst, n)
    kw = dict(loi_mode="intended", impl="pallas", band_h=256,
              band_widths=(256,), band_mode="auto")
    op_t = HybridSpMM(rp, ci, n, PlanConfig(**kw))
    op_c = HybridSpMM(rp, ci, n, PlanConfig(spill_impl="colstream", **kw))
    assert op_t.plan.spill_nnz > 0
    assert op_c.plan.cs_tile is not None and op_t.plan.cs_tile is None
    assert "cs_tile" in op_c.arrays["f"]
    rng = np.random.RandomState(0)
    x = rng.randn(n, 32).astype(np.float32)
    zref = spmm_reference_dense(rp, ci, n, x)
    scale = np.abs(zref).max() + 1e-9
    for op in (op_t, op_c):
        assert op.supports_padded
        xp = op.pad_input(jnp.asarray(x))
        z = np.asarray(op.unpad_output(op.apply_padded(op.arrays, xp), 32))
        assert np.abs(z - zref).max() / scale < 1e-5
    # gradients agree between the two implementations
    def loss(op, xp):
        return (op.apply_padded(op.arrays, xp) ** 2).sum()
    g_t = np.asarray(jax.grad(lambda v: loss(op_t, v))(
        op_t.pad_input(jnp.asarray(x))))
    g_c = np.asarray(jax.grad(lambda v: loss(op_c, v))(
        op_c.pad_input(jnp.asarray(x))))
    gs = np.abs(g_t).max() + 1e-9
    assert np.abs(g_t[:n] - g_c[:n]).max() / gs < 1e-5


def test_spill_impl_colstream_shard_plan_falls_back():
    """Shard-uniform (caps) plans must NOT build colstream arrays."""
    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.format.plan import PlanCaps, build_plan
    from hcspmm_tpu.graphs import io

    src, dst, n = io.synthetic_powerlaw(600, 4.0, seed=1)
    rp, ci = io.to_csr(src, dst, n)
    p = build_plan(rp, ci, n, PlanConfig(
        spill_impl="colstream", impl="pallas", band_h=256,
        band_widths=(256,), band_mode="auto"),
        caps=PlanCaps(num_spill_rows=4096, num_spill_edges=8192,
                      band_supers=(8,)))
    assert p.cs_tile is None
