"""ctypes binding for the C++ SA-IS builder (native/sais.cpp).

Builds the shared library on first use with g++ (no pip deps).  Falls back
gracefully — callers check ``available()`` and use the numpy builder when the
toolchain is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "sais.cpp")
_LIB = os.path.join(_HERE, "native", "libbwamem_sais.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _ensure_built() -> bool:
    global _lib, _build_failed
    if _lib is not None:
        return True
    if _build_failed:
        return False
    with _lock:
        if _lib is not None:
            return True
        if _build_failed:
            return False
        try:
            if (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-std=c++17",
                        "-shared",
                        "-fPIC",
                        "-o",
                        _LIB,
                        _SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.bwamem_sais.restype = ctypes.c_int
            lib.bwamem_sais.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
            return True
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return False


def available() -> bool:
    """Native path availability.

    BWAMEM_TPU_DISABLE_NATIVE=1 forces the pure-Python engine — the analog
    of the reference's LIBBWA_PATH native-library override
    (BwaMemIndex.java:438-441), pointed at "no native code"."""
    if os.environ.get("BWAMEM_TPU_DISABLE_NATIVE") == "1":
        return False
    return _ensure_built()


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """SA of codes+sentinel via the native SA-IS; length n+1."""
    if not _ensure_built():
        raise RuntimeError("native SA-IS unavailable")
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes)
    sa = np.empty(n + 1, dtype=np.int64)
    rc = _lib.bwamem_sais(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise MemoryError("native SA-IS failed")
    return sa
