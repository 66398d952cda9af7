"""Shared g++ invocation for the first-use native builds.

All native wrappers (engine/native_*.py, index/native_sais.py) compile their
C++ on first import when no prebuilt library is present (the packaged-wheel /
BWAMEM_TPU_NATIVE_DIR path skips this).  Centralised here so every hot kernel
gets the same flag set: ``-march=native`` buys ~20% on the memory/SIMD-bound
kernels (measured on SA-IS induce loops) and falls back to the portable flag
set on toolchains/targets that reject it.
"""
from __future__ import annotations

import subprocess

_BASE = ["g++", "-O3", "-std=c++20", "-shared", "-fPIC", "-fopenmp"]
_TUNED = ["-march=native", "-mtune=native"]


def compile_shared(sources: list[str], out: str) -> None:
    """g++-compile sources into the shared library at `out`.

    Tries the host-tuned flag set first; retries portable flags on failure.
    Raises CalledProcessError only if both fail.
    """
    try:
        subprocess.run(
            _BASE + _TUNED + ["-o", out, *sources],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        subprocess.run(
            _BASE + ["-o", out, *sources],
            check=True,
            capture_output=True,
        )
