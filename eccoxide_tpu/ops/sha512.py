"""Batched SHA-512 with a native C++ backend (hashlib fallback).

The native library (native/sha512.cpp) hashes B independent messages across
a thread pool; this is the host half of the Ed25519 pipeline (the device
half never sees variable-length data). Falls back to per-message hashlib if
the shared library is missing or fails to build.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "sha512.cpp")
    so = os.path.join(root, "native", "libsha512.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src, "-lpthread", "-ldl"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.sha512_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.sha512_batch.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def sha512_batch(msgs: list[bytes], nthreads: int = 0) -> np.ndarray:
    """Hash B messages -> (64, B) int32 byte columns."""
    lib = _build_and_load()
    n = len(msgs)
    if lib is None:
        out = np.zeros((64, n), dtype=np.int32)
        for j, m in enumerate(msgs):
            out[:, j] = np.frombuffer(hashlib.sha512(m).digest(), np.uint8)
        return out
    blob = b"".join(msgs)
    offsets = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum([len(m) for m in msgs], out=offsets[1:])
    buf = np.frombuffer(blob, dtype=np.uint8) if blob else np.zeros(1, np.uint8)
    out = np.empty((n, 64), dtype=np.uint8)
    lib.sha512_batch(
        buf.ctypes.data, offsets.ctypes.data, n, out.ctypes.data, nthreads
    )
    return np.ascontiguousarray(out.T).astype(np.int32)
