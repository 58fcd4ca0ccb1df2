#!/usr/bin/env python
"""Mosaic legalization + numerics prototype for the mxspill kernels.

Three pieces the tband spill v2 design needs, each uncertain under
Mosaic until compiled on the real TPU:

  1. in-kernel one-hot build: broadcasted_iota int32 compare against a
     per-chunk rel-id vector (VMEM int32), cast to bf16
  2. dot_general(onehot [SPAN, K], slab [dt, SPAN]) contracting
     SPAN with SPAN -> [K, dt] (einsum 'sk,ds->kd' — both operands
     "transposed" relative to plain matmul)
  3. aliased RMW scatter: out aliased to an input, grid step DMAs a
     lane slab, adds a one-hot expanded contribution, writes back

Run on TPU; compares against numpy.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPAN = 512
K = 128


def gather_kernel(lo_ref, rel_ref, x_hbm, out_ref, slab, sem):
    i = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[i], 128)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(lo, SPAN)], slab, sem)
    cp.start()
    cp.wait()
    iota = jax.lax.broadcasted_iota(jnp.int32, (SPAN, K), 0)
    oh = (iota == rel_ref[0][None, :]).astype(slab.dtype)  # [SPAN, K]
    out_ref[:] = jax.lax.dot_general(
        oh, slab[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)  # [K, dt]


def run_gather(xt, lo, rel):
    c = lo.shape[0]
    dt = xt.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda i, lo_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, K, dt), lambda i, lo_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dt, SPAN), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    def kern(lo_ref, rel_ref, x_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        lo = pl.multiple_of(lo_ref[i], 128)
        cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(lo, SPAN)], slab, sem)
        cp.start()
        cp.wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (SPAN, K), 0)
        oh = (iota == rel_ref[0, 0][None, :]).astype(slab.dtype)
        out_ref[0] = jax.lax.dot_general(
            oh, slab[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, K, dt), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(lo, rel, xt)


def run_scatter(buf, seg, lo, rel):
    """buf [dt, M] += scatter of seg [C, K, dt] at lanes lo[c]+rel[c,k].
    rel < 0 drops.  RMW via input_output_aliases; CHUNK SLABS MUST BE
    DISJOINT."""
    c = lo.shape[0]
    dt, m = buf.shape

    def kern(lo_ref, rel_ref, buf_hbm, seg_ref, out_hbm, slab, sem, sem2):
        i = pl.program_id(0)
        lo = pl.multiple_of(lo_ref[i], 128)
        cp = pltpu.make_async_copy(out_hbm.at[:, pl.ds(lo, SPAN)], slab,
                                   sem)
        cp.start()
        cp.wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (K, SPAN), 1)
        oh = (iota == rel_ref[0, 0][:, None]).astype(slab.dtype)  # [K, SPAN]
        contrib = jax.lax.dot_general(
            seg_ref[0], oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [dt, SPAN]
        slab[:] = slab[:] + contrib.astype(slab.dtype)
        cp2 = pltpu.make_async_copy(slab, out_hbm.at[:, pl.ds(lo, SPAN)],
                                    sem2)
        cp2.start()
        cp2.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda i, lo_: (i, 0, 0),
                         memory_space=pltpu.VMEM),     # rel chunk
            pl.BlockSpec(memory_space=pl.ANY),        # buf (aliased)
            pl.BlockSpec((1, K, dt), lambda i, lo_: (i, 0, 0),
                         memory_space=pltpu.VMEM),     # seg chunk
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((dt, SPAN), buf.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dt, m), buf.dtype),
        # flattened input index: lo(0), rel(1), buf(2), seg(3) -> out 0
        input_output_aliases={2: 0},
        interpret=jax.devices()[0].platform != "tpu",
    )(lo, rel, buf, seg)


def main() -> int:
    rng = np.random.RandomState(0)
    dt, m = 32, 4096
    xt = rng.randn(dt, m).astype(np.float32)
    c = 3
    lo = np.array([0, 1024, 2048], dtype=np.int32)
    rel = rng.randint(0, SPAN, size=(c, K)).astype(np.int32)

    out = np.asarray(run_gather(jnp.asarray(xt, jnp.bfloat16),
                                jnp.asarray(lo), jnp.asarray(rel)[:, None, :]))
    want = np.stack([xt[:, lo[i] + rel[i]].T for i in range(c)])
    err = np.abs(out - want.astype(np.float32)).max() / (
        np.abs(want).max() + 1e-9)
    print("gather rel err:", err)
    assert err < 2e-2, err

    # scatter: disjoint slabs, rel unique per chunk
    buf = rng.randn(dt, m).astype(np.float32)
    seg = rng.randn(c, K, dt).astype(np.float32)
    rel2 = np.stack([rng.choice(SPAN, size=K, replace=False)
                     for _ in range(c)]).astype(np.int32)
    got = np.asarray(run_scatter(jnp.asarray(buf), jnp.asarray(seg),
                                 jnp.asarray(lo), jnp.asarray(rel2)[:, None, :]))
    want2 = buf.copy()
    for i in range(c):
        want2[:, lo[i] + rel2[i]] += seg[i].T
    err2 = np.abs(got - want2).max() / (np.abs(want2).max() + 1e-9)
    print("scatter rel err:", err2)
    assert err2 < 2e-2, err2
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
