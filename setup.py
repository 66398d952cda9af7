"""Build hook: compile the native C++ runtime into the wheel when a
toolchain is available (the analog of the reference's gradle buildBwaLib ->
embedded-resource flow, build.gradle:28-50).  Compilation failure is not
fatal — the package falls back to first-use compilation or the
BWAMEM_TPU_NATIVE_DIR prebuilt override at runtime."""
import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

_NATIVES = [
    # (source(s), output .so), relative to the package root
    (["bwamem_tpu/engine/native/fmindex.cpp"],
     "bwamem_tpu/engine/native/libbwamem_fm.so"),
    (["bwamem_tpu/engine/native/chain.cpp"],
     "bwamem_tpu/engine/native/libbwamem_chain.so"),
    (["bwamem_tpu/engine/native/ksw.cpp"],
     "bwamem_tpu/engine/native/libbwamem_ksw.so"),
    (["bwamem_tpu/engine/native/align_core.cpp",
      "bwamem_tpu/engine/native/ksw.cpp"],
     "bwamem_tpu/engine/native/libbwamem_core.so"),
    (["bwamem_tpu/engine/native/pipeline.cpp"],
     "bwamem_tpu/engine/native/libbwamem_pipeline.so"),
    (["bwamem_tpu/index/native/sais.cpp"],
     "bwamem_tpu/index/native/libbwamem_sais.so"),
]


class BuildWithNatives(build_py):
    def run(self):
        for srcs, out in _NATIVES:
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++20", "-shared", "-fPIC",
                     "-fopenmp", "-o", out, *srcs],
                    check=True, capture_output=True,
                )
                print(f"built {out}")
            except (OSError, subprocess.CalledProcessError) as exc:
                print(f"skipping {out}: {exc} (will build on first use)")
        super().run()


setup(cmdclass={"build_py": BuildWithNatives})
