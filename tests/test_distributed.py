"""Multi-host distribution exercised with REAL separate processes.

Two python processes join one jax.distributed job (coordinator on
localhost), each aligns its host shard of a PE batch (parallel/
distributed.py + parallel/pipeline.py shard helpers), and the merged
result is asserted identical to a single-process run — the executable
version of the reference's "ship the image, align partitions
independently" doc pattern (BwaMemIndex.java:22-27).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.index import bwtfile, image

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, pid, nproc, img, reads_file, out_file = sys.argv[1:7]
pid, nproc = int(pid), int(nproc)

from bwamem_tpu.parallel.distributed import init_distributed
from bwamem_tpu.parallel.pipeline import shard_reads_hosts
from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats

got_pid, got_n = init_distributed(coord, nproc, pid)
assert (got_pid, got_n) == (pid, nproc), (got_pid, got_n)
assert jax.process_count() == nproc

reads = [bytes.fromhex(h) for h in json.load(open(reads_file))]
lo, shard = shard_reads_hosts(reads, pid, nproc)

idx = BwaMemIndex(img)
al = BwaMemAligner(idx)
al.align_pairs()
al.set_proper_pair_end_stats(BwaMemPairEndStats.of(250, 25))
recs = al.align_seqs(shard)
out = [
    [
        (a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.n_mismatches,
         a.mate_ref_start, a.template_len)
        for a in per_read
    ]
    for per_read in recs
]
json.dump({"lo": lo, "n": len(shard), "recs": out}, open(out_file, "w"))
idx.close()
print("worker", pid, "done", flush=True)
"""


def test_two_process_distributed_alignment(tmp_path):
    img = str(tmp_path / "d.img")
    idx = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    image.write_image(img, idx)
    fwd = idx.get_seq(0, idx.bns.l_pac)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(8)
    reads = []
    for _ in range(30):
        isize = int(rng.integers(180, 300))
        s = int(rng.integers(0, len(fwd) - isize - 1))
        reads.append(bases[fwd[s : s + 70]].tobytes())
        reads.append(
            bases[(3 - fwd[s + isize - 70 : s + isize])[::-1]].tobytes()
        )
    reads_file = str(tmp_path / "reads.json")
    json.dump([r.hex() for r in reads], open(reads_file, "w"))
    wf = str(tmp_path / "worker.py")
    open(wf, "w").write(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, wf, coord, str(i), "2", img, reads_file, outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        results.append((p.returncode, so, se))
    for rc, so, se in results:
        assert rc == 0, se[-2000:]
    # merge shards and compare with a single-process run
    from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
    from bwamem_tpu.parallel.distributed import merge_shards

    shards = []
    for o in outs:
        d = json.load(open(o))
        shards.append((d["lo"], d["recs"]))
    merged = merge_shards(shards, len(reads))
    api_idx = BwaMemIndex(img)
    try:
        al = BwaMemAligner(api_idx)
        al.align_pairs()
        al.set_proper_pair_end_stats(BwaMemPairEndStats.of(250, 25))
        single = al.align_seqs(reads)
    finally:
        api_idx.close()
    for i, per_read in enumerate(single):
        exp = [
            [a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.n_mismatches,
             a.mate_ref_start, a.template_len]
            for a in per_read
        ]
        assert merged[i] == exp, f"read {i}"
