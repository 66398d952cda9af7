"""Lockstep-batched seeding must be identical to the per-read path."""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_regs_batch
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.engine.seed_batch import collect_intv_batch
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import revcomp_codes


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def make_reads(eng, n, rng, rlen=70, err=0.01):
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    for _ in range(n):
        start = int(rng.integers(0, len(fwd) - rlen))
        r = fwd[start : start + rlen].copy()
        nerr = rng.binomial(rlen, err)
        for p in rng.integers(0, rlen, nerr):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        if rng.random() < 0.1:
            r[int(rng.integers(0, rlen))] = 4  # an N
        reads.append(r)
    # plus a read that can't align
    reads.append(rng.integers(0, 4, rlen).astype(np.uint8))
    return reads


def test_batch_seeding_matches_per_read(eng):
    opt = MemOptions()
    rng = np.random.default_rng(11)
    reads = make_reads(eng, 25, rng)
    batched = collect_intv_batch(opt, eng.fm, reads)
    for q, got in zip(reads, batched):
        exp = collect_intv(opt, eng.fm, q)
        assert len(got) == len(exp)
        for a, b in zip(got, exp):
            assert (a.x0, a.x1, a.s, a.qb, a.qe) == (b.x0, b.x1, b.s, b.qb, b.qe)


def test_batch_regs_match_per_read(eng):
    opt = MemOptions()
    rng = np.random.default_rng(17)
    reads = make_reads(eng, 20, rng, err=0.03)
    batched = align_regs_batch(opt, eng, reads)
    for q, got in zip(reads, batched):
        exp = align1_regs(opt, eng, q)
        assert len(got) == len(exp)
        for a, b in zip(got, exp):
            assert (a.rb, a.re, a.qb, a.qe, a.score, a.truesc, a.sub, a.csub,
                    a.w, a.seedcov) == (
                b.rb, b.re, b.qb, b.qe, b.score, b.truesc, b.sub, b.csub,
                b.w, b.seedcov,
            )
