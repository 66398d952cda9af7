"""ctypes binding for the native batched SW extension (native/ksw.cpp)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "ksw.cpp")
_LIB = os.path.join(_HERE, "native", "libbwamem_ksw.so")

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
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-fopenmp", "-o", _LIB, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.bwamem_ksw_extend_batch.restype = None
            lib.bwamem_ksw_extend_batch.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
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


def _p(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def extend_batch(
    jobs: List[tuple],  # (qseq, tseq) uint8 arrays
    mat: List[int],
    o_del: int, e_del: int, o_ins: int, e_ins: int, zdrop: int,
    h0s, ws, bonuses,
) -> List[dict]:
    """Batched exact ksw_extend2; one C call, OpenMP across jobs."""
    if not _ensure_built():
        raise RuntimeError("native ksw unavailable")
    n = len(jobs)
    qoff = np.zeros(n, dtype=np.int64)
    toff = np.zeros(n, dtype=np.int64)
    qlen = np.zeros(n, dtype=np.int32)
    tlen = np.zeros(n, dtype=np.int32)
    pos_q = pos_t = 0
    for i, (q, t) in enumerate(jobs):
        qoff[i], toff[i] = pos_q, pos_t
        qlen[i], tlen[i] = len(q), len(t)
        pos_q += len(q)
        pos_t += len(t)
    qbuf = np.empty(max(pos_q, 1), dtype=np.uint8)
    tbuf = np.empty(max(pos_t, 1), dtype=np.uint8)
    for i, (q, t) in enumerate(jobs):
        qbuf[qoff[i] : qoff[i] + qlen[i]] = q
        tbuf[toff[i] : toff[i] + tlen[i]] = t
    mat8 = np.asarray(mat, dtype=np.int8)
    h0a = np.asarray(h0s, dtype=np.int32)
    wa = np.asarray(ws, dtype=np.int32)
    ba = np.asarray(bonuses, dtype=np.int32)
    out = np.empty((n, 6), dtype=np.int32)
    _lib.bwamem_ksw_extend_batch(
        n,
        _p(qbuf, ctypes.c_uint8), _p(qoff, ctypes.c_int64), _p(qlen, ctypes.c_int32),
        _p(tbuf, ctypes.c_uint8), _p(toff, ctypes.c_int64), _p(tlen, ctypes.c_int32),
        _p(mat8, ctypes.c_int8),
        o_del, e_del, o_ins, e_ins, zdrop,
        _p(h0a, ctypes.c_int32), _p(wa, ctypes.c_int32), _p(ba, ctypes.c_int32),
        _p(out, ctypes.c_int32),
    )
    keys = ("score", "qle", "tle", "gtle", "gscore", "max_off")
    return [dict(zip(keys, row)) for row in out.tolist()]
