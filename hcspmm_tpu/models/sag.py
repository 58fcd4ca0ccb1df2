"""SAG — the standalone aggregation profiler (GNN_model.py:236-262).

The reference runs 200 rounds of the dim-32 fixed kernel through a
throwaway autograd function and prints the average milliseconds; this is
the harness behind the paper's single-kernel numbers (Fig. 10/Table XVI).

Two timing modes:
- ``method='chained'`` (default): K applications chained inside one jit
  (a lax.scan with a scalar-only data dependency), reported as the
  difference between two chain lengths.  Required on dispatch-latency
  heavy backends (the axon tunnel adds ~35 ms per call, which swamps any
  per-call measurement).
- ``method='loop'``: the reference's naive host loop with
  ``block_until_ready`` standing in for ``torch.cuda.synchronize``.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def chained_apply_time(fn: Callable, x: jnp.ndarray, k1: int = 2,
                       k2: int = 12, trials: int = 3) -> float:
    """Seconds per ``fn(x)`` measured inside one jit via scan-chaining.

    If ``fn`` is a HybridSpMM-like op (has ``.arrays``/``.apply``), its plan
    arrays are threaded through the jit as arguments — closure constants of
    this size cost minutes of compile (ops.spmm.make_spmm docstring).
    """
    arrays = getattr(fn, "arrays", None)
    apply_fn = (
        (lambda a, v: fn.apply(a, v)) if arrays is not None
        else (lambda a, v: fn(v))
    )

    def make(k):
        @jax.jit
        def g(arrs, xv):
            def body(c, _):
                o = apply_fn(arrs, c)
                upd = c[:8, :8] * (1 + o[0, 0].astype(c.dtype) * 1e-30)
                c2 = jax.lax.dynamic_update_slice(c, upd, (0, 0))
                return c2, o[0, 0]
            _, outs = jax.lax.scan(body, xv, None, length=k)
            return outs[-1]
        return g

    g1, g2 = make(k1), make(k2)
    float(g1(arrays, x))
    float(g2(arrays, x))

    def one(g):
        t0 = time.perf_counter()
        float(g(arrays, x))
        return time.perf_counter() - t0

    def median(v):
        v = sorted(v)
        return v[len(v) // 2] if len(v) % 2 else 0.5 * (v[len(v) // 2 - 1] + v[len(v) // 2])

    # INTERLEAVED pair differencing: chip/tunnel speed drifts on a
    # seconds scale, so timing all K1 chains then all K2 chains bakes the
    # drift into the difference (observed as physically-impossible
    # sub-roofline readings).  Adjacent (K1, K2) pairs see the same chip
    # state; the median of per-pair diffs is robust to both drift and
    # occasional multi-ms stalls.
    diffs = []
    for _ in range(trials):
        t1 = one(g1)
        t2 = one(g2)
        diffs.append(t2 - t1)
    dur = median(diffs) / (k2 - k1)
    if dur <= 0:
        # tiny-workload regime: the differencing noise exceeds the work;
        # lengthen the chain once so the signal dominates the ~35 ms RTT
        k3 = k1 + (k2 - k1) * 16
        g3 = make(k3)
        float(g3(arrays, x))
        diffs = []
        for _ in range(trials):
            t1 = one(g1)
            t3 = one(g3)
            diffs.append(t3 - t1)
        dur = median(diffs) / (k3 - k1)
    return max(dur, 1e-9)


class SAG:
    def __init__(self, spmm: Callable):
        self.spmm = spmm
        self._jitted = jax.jit(spmm)

    def profile(self, x: jnp.ndarray, num_rounds: int = 200,
                warmup: int = 10, method: str = "chained") -> Dict:
        x = jnp.asarray(x)
        if method == "chained":
            avg_ms = chained_apply_time(self.spmm, x) * 1e3
            # produce `out` with plan arrays threaded as jit ARGUMENTS:
            # jitting __call__ would bake them in as closure constants
            # (minutes of compile at scale — ops.spmm.make_spmm)
            arrays = getattr(self.spmm, "arrays", None)
            if arrays is not None:
                out = jax.jit(lambda a, v: self.spmm.apply(a, v))(arrays, x)
            else:
                out = self._jitted(x)
        else:
            out = self._jitted(x)
            for _ in range(max(warmup - 1, 0)):
                out = self._jitted(x)
            out.block_until_ready()
            start = time.perf_counter()
            for _ in range(num_rounds):
                out = self._jitted(x)
            out.block_until_ready()
            avg_ms = (time.perf_counter() - start) * 1e3 / num_rounds
        print("=> SAG profiling avg (ms): {:.3f}".format(avg_ms))
        return {"avg_ms": avg_ms, "rounds": num_rounds, "out": out,
                "method": method}
