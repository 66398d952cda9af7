"""Sampled-SA density is a pure space/time knob: alignment output and
every SA walk must be identical at any sa_intv (index/build.py)."""
import numpy as np

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.pipeline import Engine, align_regs_batch
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


def _mk(codes, sa_intv):
    return build_index(Fasta([FastaContig("c", "", codes.copy())]),
                       sa_intv=sa_intv)


def test_sa_lookup_identical_across_intv():
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 6000).astype(np.uint8)
    codes[2000:2300] = codes[100:400]
    fms = {v: FMIndex(_mk(codes, v)) for v in (8, 16, 32)}
    ks = rng.integers(0, fms[32].seq_len, 4096).astype(np.int64)
    exp = fms[32].sa_lookup(ks)
    for v in (8, 16):
        assert np.array_equal(fms[v].sa_lookup(ks), exp), v


def test_alignment_identical_across_intv():
    rng = np.random.default_rng(22)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    codes[9000:9500] = codes[1000:1500]
    opt = MemOptions()
    reads = []
    for _ in range(40):
        s = int(rng.integers(0, len(codes) - 150))
        r = codes[s:s + 150].copy()
        for p in rng.integers(0, 150, 4):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(r)

    def key(regs):
        return [(g.rb, g.re, g.qb, g.qe, g.score, g.sub, g.secondary)
                for g in regs]

    outs = []
    for v in (8, 32):
        eng = Engine(_mk(codes, v))
        outs.append([key(r) for r in align_regs_batch(opt, eng, reads)])
    assert outs[0] == outs[1]
