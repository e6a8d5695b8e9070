"""ctypes binding for the native host runtime (csrc/devit_host.cpp).

Builds the shared library on first use (g++ -O3 -shared -fPIC, cached next to
the source); falls back to numpy if the toolchain is unavailable. The public
entry is `gather_rows(src, idx)` — a multithreaded replacement for
`src[idx]` on large uint8 arrays (the per-batch host gather).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "devit_host.cpp")


def _build_lib() -> str:
    out = os.path.join(os.path.dirname(_SRC), "devit_host.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    # compile to a per-PID name + atomic replace: parallel per-division CLI
    # launches can race the first build, and dlopen of a half-written .so
    # either crashes or silently pins the slow numpy fallback
    tmp = f"{out}.tmp.{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", tmp],
        check=True, capture_output=True,
    )
    os.replace(tmp, out)
    return out


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        try:
            lib = ctypes.CDLL(_build_lib())
            lib.devit_gather_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
            _LIB = lib
        except Exception as e:
            import sys

            print(f"devit_tpu.io.native: native gather unavailable "
                  f"({type(e).__name__}: {e}); falling back to numpy "
                  f"fancy indexing (single-threaded)", file=sys.stderr)
            _LIB = False
    return _LIB if _LIB is not False else None


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """dst[i] = src[idx[i]] with a native thread pool; numpy fallback.

    Indices are range-checked HERE (same contract as numpy fancy indexing,
    which raises IndexError): the C memcpy loop (csrc/devit_host.cpp) is
    unchecked, so a negative or out-of-range index would otherwise silently
    copy out-of-bounds host memory on native hosts while wrapping/raising on
    fallback hosts — different training data per host. Negative indices are
    rejected outright (numpy's wraparound is never intended for row ids; the
    codebase uses -1 as a padded-label sentinel that must never reach here)."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= src.shape[0]):
        raise IndexError(
            f"gather_rows: index out of range [0, {src.shape[0]}): "
            f"min {int(idx.min())}, max {int(idx.max())}")
    lib = get_lib()
    if lib is None or not src.flags["C_CONTIGUOUS"] or src.dtype != np.uint8:
        return src[idx]
    n = idx.shape[0]
    item_bytes = src.strides[0]
    dst = np.empty((n,) + src.shape[1:], dtype=src.dtype)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    lib.devit_gather_u8(
        src.ctypes.data, idx.ctypes.data, n, item_bytes, dst.ctypes.data, n_threads
    )
    return dst
