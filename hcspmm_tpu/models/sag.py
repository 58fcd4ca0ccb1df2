"""SAG — the standalone aggregation profiler (GNN_model.py:236-262).

The reference runs 200 rounds of the dim-32 fixed kernel through a
throwaway autograd function and prints the average milliseconds; this is
the harness behind the paper's single-kernel numbers (Fig. 10/Table XVI).
Here the profiled op is the jitted hybrid SpMM; ``block_until_ready``
replaces ``torch.cuda.synchronize``.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


class SAG:
    def __init__(self, spmm: Callable):
        self.spmm = spmm
        self._jitted = jax.jit(spmm)

    def profile(self, x: jnp.ndarray, num_rounds: int = 200, warmup: int = 10) -> Dict:
        x = jnp.asarray(x)
        out = self._jitted(x)
        for _ in range(max(warmup - 1, 0)):
            out = self._jitted(x)
        out.block_until_ready()

        start = time.perf_counter()
        for _ in range(num_rounds):
            out = self._jitted(x)
        out.block_until_ready()
        dur = time.perf_counter() - start

        avg_ms = dur * 1e3 / num_rounds
        print("=> SAG profiling avg (ms): {:.3f}".format(avg_ms))
        return {"avg_ms": avg_ms, "rounds": num_rounds, "out": out}
