"""BWAMEM_TPU_NATIVE_DIR: prebuilt-native override (the LIBBWA_PATH analog,
BwaMemIndex.java:438-441).  With the env set, wrappers must load .so files
from that directory and never compile; pointing it at an empty directory
must degrade gracefully to the pure-python engine (still correct)."""
import os
import shutil
import subprocess
import sys

import pytest

from bwamem_tpu.engine import native_fm

_ENGINE_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bwamem_tpu", "engine", "native",
)
_INDEX_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bwamem_tpu", "index", "native",
)

_PROBE = """
import json, sys
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from bwamem_tpu.engine import native_fm, native_pipeline
from bwamem_tpu.index import native_sais
from bwamem_tpu import BwaMemAligner, BwaMemIndex
from bwamem_tpu.index.build import build_index
from bwamem_tpu.index import image
from bwamem_tpu.utils.fasta import Fasta, FastaContig

rng = np.random.default_rng(3)
codes = rng.integers(0, 4, 5000).astype(np.uint8)
img = sys.argv[1]
if not __import__("os").path.exists(img):
    image.write_image(img, build_index(Fasta([FastaContig("c", "", codes)])))
index = BwaMemIndex(img)
aligner = BwaMemAligner(index)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
recs = aligner.align_seqs([bases[codes[100:200]].tobytes()])
a = recs[0][0]
print(json.dumps({
    "native_fm": native_fm.available(),
    "native_sais": native_sais.available(),
    "pos": a.ref_start, "cigar": a.cigar, "nm": a.n_mismatches,
}))
index.close()
"""


def _run(env_extra, img):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-c", _PROBE, img],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    return json.loads(r.stdout.strip().splitlines()[-1])


def test_native_dir_loads_prebuilt_and_empty_dir_degrades(tmp_path):
    if not native_fm.available():
        pytest.skip("no C++ toolchain to produce prebuilt libraries")
    prebuilt = tmp_path / "prebuilt"
    prebuilt.mkdir()
    n = 0
    for d in (_ENGINE_NATIVE, _INDEX_NATIVE):
        for f in os.listdir(d):
            if f.endswith(".so"):
                shutil.copy(os.path.join(d, f), prebuilt / f)
                n += 1
    assert n >= 2  # at least fm + sais exist after available() above
    img = str(tmp_path / "ref.img")

    got = _run({"BWAMEM_TPU_NATIVE_DIR": str(prebuilt)}, img)
    assert got["native_fm"] is True and got["native_sais"] is True

    empty = tmp_path / "empty"
    empty.mkdir()
    degraded = _run({"BWAMEM_TPU_NATIVE_DIR": str(empty)}, img)
    assert degraded["native_fm"] is False and degraded["native_sais"] is False
    # pure-python engine still aligns identically
    assert (degraded["pos"], degraded["cigar"], degraded["nm"]) == (
        got["pos"], got["cigar"], got["nm"],
    )
