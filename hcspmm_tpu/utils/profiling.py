"""Timing + roofline helpers.

The reference measured with manual perf_counter spans and external
nvprof/Nsight (SURVEY.md §5).  Here: a `Timer` with device sync, a
`roofline` calculator against the v5e HBM/MXU peaks, and a thin wrapper
over ``jax.profiler.trace`` for perfetto traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np

from hcspmm_tpu.config import TPU_BF16_TFLOPS, TPU_FP32_TFLOPS, TPU_HBM_GBPS


class Timer:
    """Wall-clock timing with device synchronization per stop."""

    def __init__(self):
        self.records: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.records[name] = self.records.get(name, 0.0) + time.perf_counter() - t0


def time_fn(fn, *args, rounds: int = 100, warmup: int = 5) -> float:
    """Median-free average seconds per call, post-warmup, device-synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / rounds


def _parse_trace_device_us(log_dir: str) -> Dict[str, float]:
    """Sum per-name device durations from the newest trace in log_dir."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    agg: Dict[str, float] = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and not e.get("name", "").startswith("$"):
            agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0.0)
    return agg


def device_time(fn, *args, iters: int = 20, log_dir: Optional[str] = None) -> float:
    """True device seconds per call of a jitted ``fn``, via the profiler.

    Host-side timing is useless on tunnelled TPU platforms (axon): per-call
    RPC latency is 30-50 ms and ``block_until_ready`` can return early.  The
    profiler records on-device executable durations, so: warm up, trace
    ``iters`` dispatches, and divide the device time of the dominant
    ``jit_*`` event.  Falls back to wall-clock if no trace is produced.
    """
    import shutil
    import tempfile

    out = fn(*args)
    out = fn(*args)
    jax.block_until_ready(out)

    tmp = log_dir or tempfile.mkdtemp(prefix="hcspmm_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        # force real completion on platforms with weak block_until_ready
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    wall = time.perf_counter() - t0

    agg = _parse_trace_device_us(tmp)
    if log_dir is None:
        shutil.rmtree(tmp, ignore_errors=True)
    jit_events = {k: v for k, v in agg.items()
                  if k.startswith("jit_") or k.startswith("jit(")}
    if not jit_events:
        return wall / iters
    return max(jit_events.values()) / iters / 1e6


def roofline(
    seconds: float,
    bytes_moved: float,
    flops: float,
    nnz: Optional[int] = None,
    hbm_gbps: float = TPU_HBM_GBPS,
    bf16_tflops: float = TPU_BF16_TFLOPS,
) -> Dict:
    """Achieved vs peak; `bound` names the limiting resource at 100% eff."""
    t_mem = bytes_moved / (hbm_gbps * 1e9)
    t_mxu = flops / (bf16_tflops * 1e12)
    res = {
        "seconds": seconds,
        "gbytes_per_s": bytes_moved / seconds / 1e9,
        "hbm_efficiency": t_mem / seconds if seconds else 0.0,
        "tflops": flops / seconds / 1e12,
        "mxu_efficiency": t_mxu / seconds if seconds else 0.0,
        "bound": "memory" if t_mem >= t_mxu else "compute",
        "speed_of_light_s": max(t_mem, t_mxu),
    }
    if nnz:
        res["gnnz_per_s"] = nnz / seconds / 1e9
    return res


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hcspmm_trace"):
    """Perfetto trace of the enclosed block (jax.profiler)."""
    with jax.profiler.trace(log_dir):
        yield
