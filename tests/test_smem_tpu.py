"""Device bwt_smem1a / three-round seeding vs the host oracle.

The full SMEM control flow (forward snapshots + backward interval-stack
with first-dying-slot emission) runs as lockstep lanes on device
(ops/smem_tpu.py, engine/seed_device.py); every interval must be identical
to engine/seed.py::collect_intv — bi-interval coordinates included.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.engine.seed_device import collect_intv_batch_device
from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def fms():
    rota = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 20_000).astype(np.uint8)
    codes[15_000:15_300] = codes[2_000:2_300]  # repeat (low-occ split reseed)
    big = build_index(Fasta([FastaContig("c", "", codes)]))
    return FMIndex(rota), rota, FMIndex(big), big


def _reads_for(rng, idx, n, with_ns=True):
    fwd = idx.get_seq(0, idx.bns.l_pac)
    reads = []
    for _ in range(n):
        L = int(rng.integers(22, 151))
        s = int(rng.integers(0, len(fwd) - L))
        r = fwd[s : s + L].copy()
        nerr = int(rng.integers(0, 4))
        for p in rng.integers(0, L, nerr):
            r[p] = (r[p] + 1) % 4
        if with_ns and rng.integers(0, 4) == 0:  # sprinkle Ns / N runs
            p = int(rng.integers(0, L))
            run = int(rng.integers(1, 4))
            r[p : p + run] = 4
        if rng.integers(0, 2):
            r = np.where(r < 4, 3 - r, 4)[::-1].copy()
        reads.append(r)
    # edge shapes
    reads.append(np.full(30, 4, dtype=np.uint8))          # all Ns
    reads.append(fwd[0:25].copy())                        # exact short
    reads.append(np.concatenate([fwd[0:40], [4], fwd[100:140]]).astype(np.uint8))
    return reads


def test_smem_device_matches_oracle_rotavirus(fms):
    fm, idx, _, _ = fms
    opt = MemOptions()
    rng = np.random.default_rng(42)
    reads = _reads_for(rng, idx, 160)
    dev = collect_intv_batch_device(opt, fm, reads)
    for i, r in enumerate(reads):
        host = collect_intv(opt, fm, r)
        assert dev[i] == host, f"read {i}: dev {dev[i][:5]} vs host {host[:5]}"


def test_smem_device_matches_oracle_repeats(fms):
    """Repeat-rich reference exercises the round-2 re-seeding path."""
    _, _, fm, idx = fms
    opt = MemOptions()
    rng = np.random.default_rng(7)
    fwd = idx.get_seq(0, idx.bns.l_pac)
    reads = []
    for _ in range(120):
        L = int(rng.integers(30, 151))
        base = int(rng.integers(0, 2))
        s = int(rng.integers(2_000, 2_300 - 20)) if base else int(
            rng.integers(0, len(fwd) - L)
        )
        s = min(s, len(fwd) - L)
        r = fwd[s : s + L].copy()
        for p in rng.integers(0, L, int(rng.integers(0, 3))):
            r[p] = (r[p] + 1) % 4
        reads.append(r)
    dev = collect_intv_batch_device(opt, fm, reads)
    n_round2 = 0
    for i, r in enumerate(reads):
        host = collect_intv(opt, fm, r)
        assert dev[i] == host, f"read {i}"
        n_round2 += len(host)
    assert n_round2 > 0


def test_smem_device_long_fuzz(fms):
    """500-read fuzz including Ns (the VERDICT acceptance bar)."""
    fm, idx, _, _ = fms
    opt = MemOptions()
    rng = np.random.default_rng(123)
    reads = _reads_for(rng, idx, 500)
    dev = collect_intv_batch_device(opt, fm, reads)
    mismatches = [
        i for i, r in enumerate(reads) if dev[i] != collect_intv(opt, fm, r)
    ]
    assert not mismatches, f"{len(mismatches)} reads diverged: {mismatches[:5]}"


def test_device_seed_end_to_end(fms, monkeypatch):
    """BWAMEM_TPU_DEVICE_SEED=1: full alignment through device seeding
    produces regions identical to the default path."""
    import os

    from bwamem_tpu.engine.pipeline import Engine, align_regs_batch

    _, idx, _, _ = fms
    eng = Engine(idx)
    opt = MemOptions()
    rng = np.random.default_rng(3)
    reads = _reads_for(rng, idx, 40, with_ns=True)
    ref = align_regs_batch(opt, eng, reads, use_device_extension=False)
    monkeypatch.setenv("BWAMEM_TPU_DEVICE_SEED", "1")
    dev = align_regs_batch(opt, eng, reads)
    assert len(ref) == len(dev)
    for i, (a, b) in enumerate(zip(ref, dev)):
        ka = [(r.rb, r.re, r.qb, r.qe, r.rid, r.score, r.truesc) for r in a]
        kb = [(r.rb, r.re, r.qb, r.qe, r.rid, r.score, r.truesc) for r in b]
        assert ka == kb, f"read {i}"
