"""Test config: run everything on a virtual 8-device CPU mesh.

Must run before any jax import in the test process.  Note: the axon TPU
plugin ignores the JAX_PLATFORMS env var, so the config update is the
authoritative switch.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hcspmm_tpu.graphs import io  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def small_graph(n=100, deg=6, seed=0, span=16, symmetric=True):
    src, dst, nn = io.synthetic_graph(n, deg, seed=seed, span=span, symmetric=symmetric)
    rp, ci = io.to_csr(src, dst, nn)
    return rp, ci, nn


@pytest.fixture
def graph():
    return small_graph()
