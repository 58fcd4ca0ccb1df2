"""Host allocator tuning for lazy-paged VMs.

This rig (Firecracker-class microVM) services first-touch faults on new
heap extents through the hypervisor at an erratic 3 us - 1.2 ms per 4 KB
page; a plan build whose NumPy temporaries land in freshly mapped memory
measured 15.4 s cold vs 0.41 s once every page had been touched (DD-scale
power-law stand-in, format/plan.py).  glibc's defaults make this
recurrent: large buffers are mmap'd and munmap'd per allocation, so every
build pays first-touch again.

``tune()`` keeps the process arena warm instead: raise the mmap
threshold so NumPy-sized buffers come from the (recycled) brk heap,
disable trimming so freed memory is never returned to the OS, and cap
mmap count as a backstop.  Idempotent, no-op on non-glibc.  Called from
``hcspmm_tpu.__init__`` (opt out: HCSPMM_NO_MALLOC_TUNE=1).

Reference parity note: the reference's preprocess runs on-GPU
(hybrid_all_kernel.cu:339-408) and has no analog of this concern; this
module exists purely so host preprocessing hits its measured steady
state (~0.6 s analyze+plan at DD scale) instead of VM paging noise.
"""

from __future__ import annotations

import ctypes
import os

_TUNED = False

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def tune() -> bool:
    """Apply the arena tuning once; returns True if mallopt succeeded."""
    global _TUNED
    if _TUNED or os.environ.get("HCSPMM_NO_MALLOC_TUNE"):
        return _TUNED
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (
            libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
            and libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
            and libc.mallopt(_M_MMAP_MAX, 0)
        )
        _TUNED = bool(ok)
    except (OSError, AttributeError):  # musl/macOS: no mallopt
        _TUNED = False
    return _TUNED
