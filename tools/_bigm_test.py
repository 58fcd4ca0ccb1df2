import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hcspmm_tpu.train.cli import enable_compile_cache
enable_compile_cache()
import numpy as np, jax.numpy as jnp, json, time, sys
from hcspmm_tpu.graphs import io
from hcspmm_tpu.config import PlanConfig
from hcspmm_tpu.ops.spmm import HybridSpMM
from hcspmm_tpu.models.sag import chained_apply_time
from hcspmm_tpu.format import reorder as ro

import os
BI = os.environ.get('BIGM_IMPL', 'wide')
for nodes in (3_349_280,):
    t0=time.time()
    src, dst, nn = io.synthetic_blocks(nodes, 5.03, 300, seed=7)
    rp, ci = io.to_csr(src, dst, nn)
    perm = ro.rcm_reorder(rp, ci, nn)
    rp, ci = ro.apply_permutation(rp, ci, nn, perm)
    print("graph ready", nodes, round(time.time()-t0,1), file=sys.stderr, flush=True)
    op = HybridSpMM(rp, ci, nn, PlanConfig(
        compute_dtype="bfloat16", impl="pallas", band_mode="always", band_impl=BI))
    print("plan ready", round(time.time()-t0,1), file=sys.stderr, flush=True)
    x = jnp.asarray(np.random.RandomState(0).randn(nn, 32).astype(np.float32)).astype(jnp.bfloat16)
    class W:
        arrays = op.arrays
        @staticmethod
        def apply(a, v, _o=op): return _o.apply_padded(a, v)
    xp = op.pad_input(x)
    t = sorted(chained_apply_time(W, xp, k1=2, k2=8, trials=2) for _ in range(2))[0]
    sw = op.plan.padded_rows // 256
    print(json.dumps({"M": op.plan.padded_rows, "supers": sw,
        "W": list(op.plan.band_widths), "spill": op.plan.spill_nnz,
        "us": round(t*1e6,1), "ns_per_super": round(t*1e9/sw,1)}), flush=True)
