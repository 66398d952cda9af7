"""Streaming mem_process_seqs semantics in the CLI ([EXT] chunk_size at
mem_opt_t offset 96, BwaMemAligner.java:104-105): batches group by BASE
COUNT (not read count), chunk boundaries never split a pair, -K observably
changes batching, and output is invariant to the chunking.
"""
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.index import bwtfile


@pytest.fixture(scope="module")
def fastqs(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    idx = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = idx.get_seq(0, idx.bns.l_pac)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(9)
    fq1, fq2 = d / "r1.fq", d / "r2.fq"
    n = 300
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(n):
            isize = int(rng.integers(180, 300))
            s = int(rng.integers(0, len(fwd) - isize - 1))
            r1 = fwd[s : s + 70]
            r2 = (3 - fwd[s + isize - 70 : s + isize])[::-1]
            f1.write(f"@p{i}\n{bases[r1].tobytes().decode()}\n+\n{'I' * 70}\n")
            f2.write(f"@p{i}\n{bases[r2].tobytes().decode()}\n+\n{'I' * 70}\n")
    return str(d), str(fq1), str(fq2), n


def _run_mem(args):
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem", *args],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    sam = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    n_chunks = sum(1 for l in r.stderr.splitlines() if "processed" in l)
    return sam, n_chunks


def test_chunk_size_changes_batching_not_output(fastqs, tmp_path):
    d, fq1, fq2, n = fastqs
    ref = f"{REFERENCE_RESOURCES}/ref.fa"
    import shutil

    fa = str(tmp_path / "ref.fa")
    shutil.copy(ref, fa)
    # big chunks: one batch; small chunks (-K 6000 bases ~ 42 pairs): many
    sam_big, chunks_big = _run_mem([fa, fq1, fq2, "--insert-mean", "240"])
    sam_small, chunks_small = _run_mem(
        [fa, fq1, fq2, "--insert-mean", "240", "-K", "6000"]
    )
    assert chunks_big == 1
    assert chunks_small >= 5, "small -K must produce many chunks"
    assert sam_big == sam_small, "output must be invariant to chunking"
    assert len(sam_big) >= 2 * n  # every read reported


def test_chunks_group_by_bases_and_keep_pairs(fastqs):
    """Unit-level: the chunker cuts on base count and never splits pairs."""
    from bwamem_tpu.__main__ import _chunker

    class R:
        def __init__(self, L):
            self.seq = "A" * L

    it1 = iter([R(100)] * 10)
    it2 = iter([R(100)] * 10)
    chunks = list(_chunker(zip(it1, it2), 500, paired=True))
    # 200 bases/pair, 500-base chunks -> ceil: 3 pairs per chunk
    assert [len(c) for c in chunks] == [3, 3, 3, 1]
    total = sum(len(c) for c in chunks)
    assert total == 10
    # unpaired: variable lengths split on the bases threshold
    it = iter([R(50), R(400), R(400), R(50)])
    chunks = list(_chunker(it, 450, paired=False))
    assert [sum(len(r.seq) for r in c) for c in chunks] == [450, 450]


def test_shard_outputs_merge_to_unsharded(fastqs, tmp_path):
    """--shard I/N partitions work across processes (the reference's
    documented Spark/Yarn cluster pattern, BwaMemIndex.java:22-27) with
    ids computed from original stream ordinals, so the merged shard SAM
    equals the single-process SAM line-for-line."""
    d, fq1, fq2, n = fastqs
    import shutil

    fa = str(tmp_path / "ref.fa")
    shutil.copy(f"{REFERENCE_RESOURCES}/ref.fa", fa)
    # paired-end with caller-provided insert stats (inference is
    # batch-composition-dependent by design; provided stats pin it)
    full, _ = _run_mem([fa, fq1, fq2, "--insert-mean", "240"])
    s0, _ = _run_mem([fa, fq1, fq2, "--insert-mean", "240", "--shard", "0/2"])
    s1, _ = _run_mem([fa, fq1, fq2, "--insert-mean", "240", "--shard", "1/2"])
    assert sorted(s0 + s1) == sorted(full)
    assert len(s0) + len(s1) == len(full)
    # single-end: primary marking uses the Wang hash of the read id
    full_se, _ = _run_mem([fa, fq1])
    se0, _ = _run_mem([fa, fq1, "--shard", "0/3"])
    se1, _ = _run_mem([fa, fq1, "--shard", "1/3"])
    se2, _ = _run_mem([fa, fq1, "--shard", "2/3"])
    assert sorted(se0 + se1 + se2) == sorted(full_se)


def test_shard_rejects_bad_spec(fastqs, tmp_path):
    d, fq1, fq2, n = fastqs
    import shutil

    fa = str(tmp_path / "ref.fa")
    shutil.copy(f"{REFERENCE_RESOURCES}/ref.fa", fa)
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem", fa, fq1, "--shard", "3/2"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 2
    assert "bad --shard" in r.stderr
