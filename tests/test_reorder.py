"""LOA reorderer: native C++ vs NumPy oracle, objective improvement,
permutation validity, SpMM invariance under relabeling (SURVEY.md §4.1)."""

import numpy as np
import pytest

from hcspmm_tpu.format import reorder
from hcspmm_tpu.graphs import io

from conftest import small_graph


def _intensity(rp, ci, n, wh=16):
    nnz, uniq = reorder.window_intensity(rp, ci, n, wh)
    mask = uniq > 0
    return float(nnz[mask].sum() / uniq[mask].sum())


def test_native_lib_builds():
    assert reorder._build_lib() is not None, "g++ build of native/loa.cpp failed"


def test_perm_is_valid_permutation():
    rp, ci, nn = small_graph(200, 6, span=64)
    perm = reorder.loa_reorder(rp, ci, nn)
    assert sorted(perm.tolist()) == list(range(nn))


def test_native_matches_python_backend():
    rp, ci, nn = small_graph(150, 5, span=48)
    p_native = reorder.loa_reorder(rp, ci, nn, backend="native")
    p_py = reorder.loa_reorder_py(rp, ci, rp, ci, nn)
    np.testing.assert_array_equal(p_native, p_py)


def test_loa_improves_intensity():
    # scatter rows so natural windows share few columns, then reorder
    rng = np.random.RandomState(0)
    src, dst, nn = io.synthetic_graph(400, 8, seed=3, span=200)
    rp, ci = io.to_csr(src, dst, nn)
    before = _intensity(rp, ci, nn)
    perm = reorder.loa_reorder(rp, ci, nn)
    rp2, ci2 = reorder.apply_permutation(rp, ci, nn, perm)
    after = _intensity(rp2, ci2, nn)
    assert after > before, (before, after)


def test_rcm_reduces_bandwidth():
    src, dst, nn = io.synthetic_graph(300, 6, seed=1, span=150)
    rp, ci = io.to_csr(src, dst, nn)

    def bandwidth(rp, ci, n):
        rows = np.repeat(np.arange(n), np.diff(rp))
        return int(np.abs(rows - ci).max()) if len(ci) else 0

    perm = reorder.rcm_reorder(rp, ci, nn)
    rp2, ci2 = reorder.apply_permutation(rp, ci, nn, perm)
    assert bandwidth(rp2, ci2, nn) <= bandwidth(rp, ci, nn)


def test_spmm_invariant_under_relabeling():
    import jax

    from hcspmm_tpu.config import PlanConfig
    from hcspmm_tpu.ops.spmm import HybridSpMM

    rp, ci, nn = small_graph(120, 6, span=60)
    x = np.random.RandomState(0).randn(nn, 24).astype(np.float32)
    z0 = np.asarray(jax.jit(HybridSpMM(rp, ci, nn, PlanConfig()))(x))

    perm = reorder.loa_reorder(rp, ci, nn)
    rp2, ci2 = reorder.apply_permutation(rp, ci, nn, perm)
    z1 = np.asarray(jax.jit(HybridSpMM(rp2, ci2, nn, PlanConfig()))(x[perm]))
    np.testing.assert_allclose(z1, z0[perm], rtol=1e-4, atol=1e-4)


def test_zero_degree_rows_appended():
    # rows with no edges must still appear in the permutation
    rp = np.array([0, 2, 2, 4, 4], dtype=np.int32)
    ci = np.array([2, 3, 0, 1], dtype=np.int32)
    perm = reorder.loa_reorder(rp, ci, 4, window_h=2)
    assert sorted(perm.tolist()) == [0, 1, 2, 3]


def test_pack_reorder_valid_and_band_friendly():
    from hcspmm_tpu.format.windows import analyze_windows

    # mixed component sizes: packing should beat raw RCM on band coverage
    rng = np.random.RandomState(0)
    sizes = [30, 70, 100, 128, 60, 40, 50, 90, 80, 64]
    src_parts, dst_parts = [], []
    lo = 0
    for s in sizes:
        cnt = s * 3
        src_parts.append(rng.randint(lo, lo + s, size=cnt))
        dst_parts.append(rng.randint(lo, lo + s, size=cnt))
        lo += s
    n = lo
    src = np.concatenate(src_parts); dst = np.concatenate(dst_parts)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    shuf = rng.permutation(n)
    src, dst = shuf[src], shuf[dst]
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    rp, ci = io.to_csr(src, dst, n)

    perm = reorder.pack_reorder(rp, ci, n, band_h=128)
    assert sorted(perm.tolist()) == list(range(n))

    def mean_extent(rp2, ci2, bh=128):
        rp64 = np.asarray(rp2, np.int64)
        c64 = np.asarray(ci2, np.int64)
        s_ = (n + bh - 1) // bh
        r0 = np.minimum(np.arange(s_) * bh, n)
        r1 = np.minimum(r0 + bh, n)
        es, ee = rp64[r0], rp64[r1]
        idx = np.where(ee > es)[0]
        mn = np.minimum.reduceat(c64, es[idx])
        mx = np.maximum.reduceat(c64, es[idx])
        return float((mx - mn + 1).mean())

    rp_p, ci_p = reorder.apply_permutation(rp, ci, n, perm)
    rp_r, ci_r = reorder.apply_permutation(
        rp, ci, n, reorder.rcm_reorder(rp, ci, n))
    assert mean_extent(rp_p, ci_p) <= mean_extent(rp_r, ci_r) * 1.05


def test_cluster_reorder_valid_and_recovers_communities():
    """cluster_reorder on a DC-SBM graph: valid permutation, members of
    discovered communities contiguous, and band locality far better than
    RCM (the regime RCM fails: a few % mixing edges destroy BFS
    layering; see reorder.cluster_reorder docstring)."""
    src, dst, n = io.synthetic_dcsbm(
        8192, 6.0, mixing=0.1, comm_min=32, comm_max=200, seed=5
    )
    rp, ci = io.to_csr(src, dst, n)
    perm = reorder.cluster_reorder(rp, ci, n, band_h=256)
    assert len(np.unique(perm)) == n  # valid permutation

    rp2, ci2 = reorder.apply_permutation(rp, ci, n, perm)
    e_row = np.repeat(np.arange(n), np.diff(rp2))
    near = np.abs(ci2.astype(np.int64) - e_row) <= 1024
    rpr, cir = reorder.apply_permutation(
        rp, ci, n, reorder.rcm_reorder(rp, ci, n))
    e_row_r = np.repeat(np.arange(n), np.diff(rpr))
    near_r = np.abs(cir.astype(np.int64) - e_row_r) <= 1024
    assert near.mean() > 0.75, near.mean()
    assert near.mean() > near_r.mean() + 0.1, (near.mean(), near_r.mean())


def test_agglomerate_respects_cap_roughly():
    src, dst, n = io.synthetic_dcsbm(
        4096, 6.0, mixing=0.2, comm_min=32, comm_max=128, seed=1
    )
    rp, ci = io.to_csr(src, dst, n)
    lab = reorder._agglomerate_labels(rp, ci, n, cap=256, rounds=30)
    _, c = np.unique(lab, return_counts=True)
    # same-round fan-in can overshoot the cap, but boundedly
    assert c.max() <= 2 * 256, c.max()
    # most edges intra-cluster on a clustered graph
    e_row = np.repeat(np.arange(n), np.diff(rp))
    assert (lab[e_row] == lab[ci]).mean() > 0.6


def test_native_cluster_labels_match_numpy():
    """native/cluster.cpp is a bit-identical port of _agglomerate_labels
    (same best-partner tie-breaking, parity matching, pre-round size
    snapshot)."""
    from hcspmm_tpu.format.reorder import _agglomerate_labels, _cluster_lib
    from hcspmm_tpu.graphs import io

    if _cluster_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    for n, deg, span, seed in [(400, 5, 16, 0), (900, 7, 200, 1),
                               (2000, 6, 1500, 2)]:
        src, dst, nn = io.synthetic_graph(n, deg, seed=seed, span=span)
        rp, ci = io.to_csr(src, dst, nn)
        a = _agglomerate_labels(rp, ci, nn, rounds=25, backend="numpy")
        b = _agglomerate_labels(rp, ci, nn, rounds=25, backend="native")
        assert (a == b).all(), int((a != b).sum())


def test_native_cluster_cap_parity():
    """The size cap steers merges identically in both backends.  (It is
    NOT a hard bound in either: several bit-0 sources may merge into one
    bit-1 target in a round, each checked against the pre-round size
    snapshot — the packer splits oversized groups across bins anyway.)"""
    from hcspmm_tpu.format.reorder import _agglomerate_labels, _cluster_lib
    from hcspmm_tpu.graphs import io

    if _cluster_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    src, dst, nn = io.synthetic_graph(1500, 8, seed=3, span=64)
    rp, ci = io.to_csr(src, dst, nn)
    for cap in (16, 64, 1024):
        a = _agglomerate_labels(rp, ci, nn, cap=cap, rounds=25,
                                backend="numpy")
        b = _agglomerate_labels(rp, ci, nn, cap=cap, rounds=25,
                                backend="native")
        assert (a == b).all(), (cap, int((a != b).sum()))
