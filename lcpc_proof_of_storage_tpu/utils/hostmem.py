"""Host allocator tuning for first-touch-expensive VMs.

On Firecracker-class microVM kernels (this image: 6.18.5-fc), faulting in a
fresh anonymous page costs ~40 us — ~25 MB/s for a large allocation — while
warm pages move at ~8 GB/s.  glibc's default M_MMAP_THRESHOLD (128 KB,
dynamically up to 32 MB) makes every large numpy buffer a fresh mmap, so the
fault cost is paid on EVERY allocation.  Raising the mmap/trim thresholds
keeps big blocks on the sbrk heap and retains the pages across free(),
making the fault cost one-time.  No-op (returns False) on non-glibc.

This is purely a host-side tweak: device (TPU) buffers are unaffected.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_done = False

_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3


def tune_allocator(threshold: int = 1 << 30, top_pad: int = 64 << 20) -> bool:
    """Serve allocations below `threshold` from the retained heap."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold)
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold)
              and libc.mallopt(_M_TOP_PAD, top_pad))
        _done = bool(ok)
        return _done
    except Exception:
        return False
