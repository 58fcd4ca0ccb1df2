"""Config/graph fuzz: random graphs x random plan configs vs the dense
oracle (interpret mode).  Catches population-routing edge cases the
hand-written shape tests miss."""

import jax
import numpy as np
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.graphs import io
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_random_config_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(20, 400))
    deg = float(rng.uniform(0.5, 12))
    style = rng.choice(["blocks", "span"])
    if style == "blocks":
        src, dst, nn = io.synthetic_blocks(
            n, deg, int(rng.randint(8, 64)), seed=seed)
    else:
        src, dst, nn = io.synthetic_graph(
            n, deg, seed=seed, span=int(rng.randint(4, 128)))
    rp, ci = io.to_csr(src, dst, nn)
    if rng.rand() < 0.5:
        from hcspmm_tpu.format import reorder as _ro

        perm = _ro.rcm_reorder(rp, ci, nn)
        rp, ci = _ro.apply_permutation(rp, ci, nn, perm)

    wh = 16
    bh = wh * int(rng.randint(1, 5))
    widths_pool = [(128,), (128, 256), (256,), "auto"]
    cfg = PlanConfig(
        impl=rng.choice(["pallas", "xla"]),
        loi_mode=rng.choice(["intended", "degenerate", "calibrated",
                             "all_dense", "all_sparse"]),
        band_mode=rng.choice(["auto", "always", "never"]),
        band_h=bh,
        band_widths=widths_pool[rng.randint(len(widths_pool))],
        band_impl=rng.choice(["wide", "tiled"]),
        bucket_widths=(8, 32, 128),
        ell_widths=(4, 16, 64),
        compute_dtype="float32",
    )
    dim = int(rng.randint(1, 70))
    x = rng.randn(nn, dim).astype(np.float32)
    op = HybridSpMM(rp, ci, nn, cfg)
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, nn, x)
    scale = np.abs(zref).max() + 1e-9
    err = np.abs(z - zref).max() / scale
    assert err < 5e-4, (err, cfg)
    if getattr(op, "supports_padded", False):
        import jax.numpy as jnp

        xp = op.pad_input(jnp.asarray(x))
        zp = np.asarray(op.unpad_output(
            jax.jit(lambda a, v: op.apply_padded(a, v))(op.arrays, xp), dim))
        assert np.abs(zp - zref).max() / scale < 5e-4


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_tband_spill_chain_tiny_caps(seed):
    """Round-5 spill chain fuzz: random power-law graphs under FORCED
    tiny caps so the mxgather T1 + segmented T2 + hub-split machinery
    all trigger at toy scale, vs the dense oracle (interpret mode)."""
    rng = np.random.RandomState(100 + seed)
    n = int(rng.randint(600, 1800))
    src, dst, nn = io.synthetic_graph(
        n, float(rng.uniform(4, 10)), seed=seed,
        span=int(rng.randint(300, max(301, n))))
    rp, ci = io.to_csr(src, dst, nn)
    cap_slots = int(rng.choice([32, 48, 96]))
    hub_slots = int(rng.choice([0, 32, 64]))
    cfg = PlanConfig(
        impl="pallas", band_impl="tband", band_mode="auto",
        band_h=128, band_widths=(128,),
        ts_table_mb=1e-3, ts_span=256, ts_k=int(rng.choice([16, 32])),
        ts2_table_mb=cap_slots * 64 / 1e6,
        spill_hub_mb=hub_slots * 64 / 1e6,
        spill_hub_min_cov=0.01, spill_hub_min_reuse=0.0,
        compute_dtype="float32",
    )
    dim = int(rng.randint(3, 40))
    x = rng.randn(nn, dim).astype(np.float32)
    op = HybridSpMM(rp, ci, nn, cfg)
    assert op.plan.spill_nnz > 0
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, nn, x)
    scale = np.abs(zref).max() + 1e-9
    err = np.abs(z - zref).max() / scale
    assert err < 5e-4, (err, cap_slots, hub_slots,
                        op.plan.hub_lo is not None,
                        bool(getattr(op.plan, "ts2_segs", None)))
