"""ctypes binding for the native host-gather library.

Counterpart of the reference's pybind'd CUDA module (reference
kernels/main.cu:42-81): here the native surface is the host-DRAM side
of the offloaded V store — a multithreaded row gather
(native/host_gather.cpp) compiled on first use with g++ and loaded via
ctypes (no pybind11 in this environment). Falls back to numpy fancy
indexing when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "host_gather.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhost_gather.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        print(f"[native] host_gather build failed: {e}", file=sys.stderr)
        return False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            print(f"[native] host_gather load failed: {e}", file=sys.stderr)
            _lib_failed = True
            return None
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gather_rows_masked.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def gather_rows(
    src: np.ndarray,  # [N_src, row...] C-contiguous
    idx: np.ndarray,  # [N] int64 row indices into src
    skip: np.ndarray | None = None,  # [N] bool/int8; True rows untouched
    out: np.ndarray | None = None,
    n_threads: int = 0,
) -> np.ndarray:
    """out[i] = src[idx[i]] (where not skipped). Uses the native lib
    when available, numpy otherwise."""
    n = idx.shape[0]
    row_shape = src.shape[1:]
    row_bytes = int(np.prod(row_shape)) * src.dtype.itemsize
    if out is None:
        out = np.empty((n,) + row_shape, src.dtype)
    assert src.flags.c_contiguous and out.flags.c_contiguous
    idx64 = np.ascontiguousarray(idx, np.int64)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    lib = _load()
    if lib is None:
        if skip is not None:
            sel = ~np.asarray(skip, bool)
            out[sel] = src[idx64[sel]]
        else:
            out[:] = src[idx64]
        return out
    if skip is None:
        lib.gather_rows(
            src.ctypes.data_as(ctypes.c_void_p),
            idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.c_void_p),
            n, row_bytes, n_threads,
        )
    else:
        skip8 = np.ascontiguousarray(np.asarray(skip, np.int8))
        lib.gather_rows_masked(
            src.ctypes.data_as(ctypes.c_void_p),
            idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            skip8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            out.ctypes.data_as(ctypes.c_void_p),
            n, row_bytes, n_threads,
        )
    return out
