"""Lane-oriented spill machinery (kernels/tspill.py) vs numpy oracles.

Covers the transposed-band spill path's three kernels — aliased
zero-fill (both orientations, incl. the 8-wide batched blocks), the
tbstream one-hot merge, and the mxgather compact-table build — plus the
host chunker's invariants.  Runs in Pallas interpret mode on the CPU
mesh like the rest of the suite."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hcspmm_tpu.kernels.tspill import (  # noqa: E402
    build_mx_chunks,
    mxgather_lanes,
    tbstream_merge,
    zero_lane_blocks,
    zero_row_blocks,
)


def test_zero_lane_blocks():
    rng = np.random.RandomState(0)
    dt, m, bh = 16, 2048, 128
    buf = rng.randn(dt, m).astype(np.float32)
    ids = np.array([0, 3, 7], dtype=np.int32)
    got = np.asarray(zero_lane_blocks(jnp.asarray(buf), jnp.asarray(ids),
                                      bh))
    want = buf.copy()
    for i in ids:
        want[:, i * bh:(i + 1) * bh] = 0
    np.testing.assert_array_equal(got, want)
    # empty ids: no-op passthrough
    same = zero_lane_blocks(jnp.asarray(buf),
                            jnp.zeros(0, dtype=jnp.int32), bh)
    np.testing.assert_array_equal(np.asarray(same), buf)


def test_zero_row_blocks_and_8wide():
    rng = np.random.RandomState(1)
    m, dp, bh = 4096, 128, 256
    buf = rng.randn(m, dp).astype(np.float32)
    ids8 = np.array([1], dtype=np.int32)   # supers 8..15 as one block
    ids1 = np.array([2, 5], dtype=np.int32)
    got = zero_row_blocks(jnp.asarray(buf), jnp.asarray(ids8), 8 * bh)
    got = np.asarray(zero_row_blocks(got, jnp.asarray(ids1), bh))
    want = buf.copy()
    want[8 * bh:16 * bh] = 0
    for i in ids1:
        want[i * bh:(i + 1) * bh] = 0
    np.testing.assert_array_equal(got, want)


def test_tbstream_merge_oracle():
    rng = np.random.RandomState(2)
    dt, m, group = 8, 2048, 4          # span = 512 lanes, 4 blocks
    span = group * 128
    e = 300
    rows = np.sort(rng.randint(0, m, size=e)).astype(np.int64)
    xsrc = rng.randn(dt, e).astype(np.float32)

    # host chunking mirrors dstream.build_bstream's contract: chunks
    # break at block boundaries and every 128 slots
    from hcspmm_tpu.kernels.dstream import build_bstream

    cols = np.arange(e, dtype=np.int64)  # gather straight from xsrc
    gcols, local, blk, grp = build_bstream(rows, cols, m, pad_col=e,
                                           group=group)
    # pad slots re-fetch the chunk's first col; sentinel local drops them
    local_t = local.astype(np.int32)   # [ceil(C/8)*8, bw] lane rows
    gathered = jnp.take(jnp.asarray(xsrc), jnp.asarray(gcols), axis=1,
                        mode="clip")
    buf = rng.randn(dt, m).astype(np.float32)
    got = np.asarray(tbstream_merge(gathered, jnp.asarray(local_t),
                                    jnp.asarray(blk),
                                    jnp.asarray(buf), group=grp))
    want = buf.copy()
    for j in range(e):
        want[:, rows[j]] += xsrc[:, j]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tbstream_merge_batched_oracle():
    """Round-5 chunk batching: bw = 256/512-edge chunks (chunk_edges)
    must produce the same scatter-add as the 128-edge layout."""
    rng = np.random.RandomState(5)
    dt, m, group = 8, 4096, 4
    e = 1800
    rows = np.sort(rng.randint(0, m, size=e)).astype(np.int64)
    xsrc = rng.randn(dt, e).astype(np.float32)
    from hcspmm_tpu.kernels.dstream import build_bstream

    cols = np.arange(e, dtype=np.int64)
    for bw in (256, 512):
        gcols, local, blk, grp = build_bstream(rows, cols, m, pad_col=e,
                                               group=group,
                                               chunk_edges=bw)
        assert local.shape[1] == bw
        local_t = local.astype(np.int32)
        gathered = jnp.take(jnp.asarray(xsrc), jnp.asarray(gcols),
                            axis=1, mode="clip")
        buf = rng.randn(dt, m).astype(np.float32)
        got = np.asarray(tbstream_merge(gathered, jnp.asarray(local_t),
                                        jnp.asarray(blk),
                                        jnp.asarray(buf), group=grp))
        want = buf.copy()
        for j in range(e):
            want[:, rows[j]] += xsrc[:, j]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_build_mx_chunks_invariants():
    rng = np.random.RandomState(3)
    m, span, k = 99_968, 1024, 64  # 128-multiple (padded lane space)
    ucols = np.unique(rng.randint(0, m, size=5000))
    lo, rel, slot = build_mx_chunks(ucols, span, k, m)
    assert rel.shape[1:] == (1, k)
    assert lo.shape[0] == rel.shape[0]
    assert np.all(lo % 128 == 0) and np.all(lo + span <= m)
    # every col recovered at its slot
    c_of, j_of = slot // k, slot % k
    rec = lo[c_of] + rel[c_of, 0, j_of]
    np.testing.assert_array_equal(rec, ucols)
    # pads are -1
    used = np.zeros(rel.shape[0] * k, dtype=bool)
    used[slot] = True
    assert np.all(rel.reshape(-1)[~used] == -1)


def test_mxgather_lanes_oracle():
    rng = np.random.RandomState(4)
    dt, m, span, k = 16, 8192, 512, 32
    xt = rng.randn(dt, m).astype(np.float32)
    ucols = np.unique(rng.randint(0, m, size=700))
    lo, rel, slot = build_mx_chunks(ucols, span, k, m)
    out = np.asarray(mxgather_lanes(jnp.asarray(xt), jnp.asarray(lo),
                                    jnp.asarray(rel), span=span))
    np.testing.assert_allclose(out[:, slot], xt[:, ucols],
                               rtol=2e-5, atol=2e-5)
    # pad slots are exact zeros
    used = np.zeros(out.shape[1], dtype=bool)
    used[slot] = True
    assert np.all(out[:, ~used] == 0)
