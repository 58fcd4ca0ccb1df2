"""Pallas kernel path vs dense oracle (interpret mode on the CPU mesh).

Mirrors the adversarial-shape matrix of test_spmm for impl='pallas'
(SURVEY.md §4.1).  On CPU the kernels run through the Pallas interpreter,
which also catches OOB indexing (SURVEY.md §5 race-detection plan).
"""

import jax
import numpy as np
import pytest

from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.graphs import io
from hcspmm_tpu.ops.spmm import HybridSpMM, spmm_reference_dense

from conftest import small_graph


def check(rp, ci, nn, dim, cfg, tol=1e-5, seed=0, grad=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(nn, dim).astype(np.float32)
    op = HybridSpMM(rp, ci, nn, cfg)
    z = np.asarray(jax.jit(op)(x))
    zref = spmm_reference_dense(rp, ci, nn, x)
    scale = np.abs(zref).max() + 1e-9
    err = np.abs(z - zref).max() / scale
    assert err < tol, f"rel err {err}"
    return op


@pytest.mark.parametrize("mode", ["intended", "all_dense", "all_sparse"])
@pytest.mark.parametrize("dim", [7, 32, 96])
def test_pallas_modes_dims(mode, dim):
    rp, ci, nn = small_graph(100, 6)
    check(rp, ci, nn, dim, PlanConfig(loi_mode=mode, impl="pallas"))


def test_pallas_unaligned_nodes_and_wide_windows():
    rp, ci, nn = small_graph(101, 12, span=64)
    check(rp, ci, nn, 33,
          PlanConfig(loi_mode="all_dense", bucket_widths=(8, 16), impl="pallas"))


def test_pallas_bf16_tolerance():
    rp, ci, nn = small_graph(100, 6)
    check(rp, ci, nn, 32,
          PlanConfig(compute_dtype="bfloat16", impl="pallas"), tol=2e-2)


def test_pallas_gradient_matches_xla():
    import jax.numpy as jnp

    rp, ci, nn = small_graph(80, 5)
    x = np.random.RandomState(3).randn(nn, 16).astype(np.float32)
    op_p = HybridSpMM(rp, ci, nn, PlanConfig(impl="pallas"))
    op_x = HybridSpMM(rp, ci, nn, PlanConfig(impl="xla"))

    def loss(op, x):
        return jnp.sum(op(jnp.asarray(x)) ** 2)

    gp = jax.grad(lambda v: loss(op_p, v))(jnp.asarray(x))
    gx = jax.grad(lambda v: loss(op_x, v))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,deg,dim", [
    (17, 2, 1),        # tiny graph, dim 1
    (100, 3, 130),     # dim just over one lane tile
    (100, 3, 257),     # dim over two lane tiles
    (3, 1, 8),         # n smaller than every block size
])
def test_pallas_adversarial_shapes(n, deg, dim):
    rp, ci, nn = small_graph(n, deg, span=max(4, n // 4))
    check(rp, ci, nn, dim, PlanConfig(impl="pallas"), tol=1e-4)


def test_pallas_single_node_self_loop():
    import numpy as np

    rp = np.array([0, 1], np.int32)
    ci = np.array([0], np.int32)
    check(rp, ci, 1, 5, PlanConfig(impl="pallas"), tol=1e-5)


def test_pallas_empty_graph():
    import numpy as np

    rp = np.zeros(33, np.int32)
    ci = np.zeros(0, np.int32)
    x = np.random.RandomState(0).randn(32, 9).astype(np.float32)
    import jax

    from hcspmm_tpu.ops.spmm import HybridSpMM

    op = HybridSpMM(rp, ci, 32, PlanConfig(impl="pallas"))
    z = np.asarray(jax.jit(op)(x))
    assert (z == 0).all()


def test_pallas_band_smaller_than_graph_pad():
    # graph smaller than the largest band bucket: xp row padding must cover
    rp, ci, nn = small_graph(40, 4, span=8)
    check(rp, ci, nn, 16,
          PlanConfig(impl="pallas", band_mode="always",
                     band_h=32, band_widths=(64, 2048)), tol=1e-5)
