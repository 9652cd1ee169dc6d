"""Host-memory helpers: transparent-huge-page-backed numpy allocation.

On this image (Firecracker VM, THP in `madvise` mode) first-touch page
faults on fresh 4 KiB-paged anonymous memory run at ~20-30 MB/s — a fresh
1 GB numpy array costs ~36 s the first time it is written. `madvise(...,
MADV_HUGEPAGE)` on the same allocation before first touch drops that to
~0.3 s (measured; 2 MiB pages -> 512x fewer faults). Ingestion-scale host
buffers (dense 131k x 2k response/mask matrices are ~1.07 GB each) are
exactly this pattern, so the data layer routes its big allocations through
`empty_hugepages` / `zeros_hugepages`.

Pure advice: on kernels without THP (or non-Linux) madvise fails or is a
no-op and the arrays behave like plain numpy allocations. Never required
for correctness.
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

_MADV_HUGEPAGE = 14
_HUGE = 2 << 20               # 2 MiB THP granule
_MIN_BYTES = 16 << 20         # not worth syscalls below ~16 MB
_libc = None


def _get_libc():
    global _libc
    if _libc is None and sys.platform.startswith("linux"):
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        except OSError:
            _libc = False
    return _libc or None


def madvise_hugepages(a: np.ndarray) -> np.ndarray:
    """Advise THP backing for `a`'s buffer (best effort, returns `a`).

    Only useful BEFORE the array's pages are first written; numpy's large
    allocations come from fresh mmap, so calling this straight after
    np.empty/np.zeros is the intended pattern."""
    libc = _get_libc()
    if libc is None or a.nbytes < _MIN_BYTES or not a.flags.owndata:
        return a
    addr = a.ctypes.data
    aligned = (addr + _HUGE - 1) & ~(_HUGE - 1)
    length = a.nbytes - (aligned - addr)
    if length >= _HUGE:
        libc.madvise(ctypes.c_void_p(aligned), ctypes.c_size_t(length),
                     _MADV_HUGEPAGE)
    return a


def empty_hugepages(shape, dtype=np.float32) -> np.ndarray:
    return madvise_hugepages(np.empty(shape, dtype))


def zeros_hugepages(shape, dtype=np.float32) -> np.ndarray:
    # np.zeros' pages are untouched (lazy zero-fill) until written, so the
    # advice still precedes every fault
    return madvise_hugepages(np.zeros(shape, dtype))
