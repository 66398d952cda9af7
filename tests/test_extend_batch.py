"""Wave-batched chain extension must match the per-read path exactly."""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_regs_batch
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import revcomp_codes


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def _reads(eng, rng, n, rlen=100, err=0.04, indels=True):
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    for _ in range(n):
        start = int(rng.integers(0, len(fwd) - rlen - 6))
        r = fwd[start : start + rlen].copy()
        for p in rng.integers(0, rlen, rng.binomial(rlen, err)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if indels and rng.random() < 0.4:
            pos = int(rng.integers(5, rlen - 8))
            ln = int(rng.integers(1, 4))
            if rng.random() < 0.5:  # deletion from read
                r = np.concatenate([r[:pos], r[pos + ln :]])
            else:  # insertion
                ins = rng.integers(0, 4, ln).astype(np.uint8)
                r = np.concatenate([r[:pos], ins, r[pos:]])
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        reads.append(r)
    return reads


def test_wave_batched_regs_match(eng):
    opt = MemOptions()
    rng = np.random.default_rng(23)
    reads = _reads(eng, rng, 30)
    got_all = align_regs_batch(opt, eng, reads, use_device_extension=True)
    for q, got in zip(reads, got_all):
        exp = align1_regs(opt, eng, q)
        assert len(got) == len(exp), (len(got), len(exp))
        for a, b in zip(got, exp):
            assert (
                a.rb, a.re, a.qb, a.qe, a.score, a.truesc, a.w, a.seedcov,
                a.seedlen0, a.rid,
            ) == (
                b.rb, b.re, b.qb, b.qe, b.score, b.truesc, b.w, b.seedcov,
                b.seedlen0, b.rid,
            )
