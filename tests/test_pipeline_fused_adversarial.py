"""Adversarial exactness for the one-dispatch pipeline: non-default
scoring options (different band/bonus/zdrop statics), pathological
repeat fields (walk-budget and region-slot overflows must demote to the
host oracle, not corrupt), and contig-boundary reads."""
import numpy as np
import pytest

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.chain import chain_flt, flt_chained_seeds, mem_chain
from bwamem_tpu.engine.extend import chain2aln
from bwamem_tpu.engine.pipeline import Engine
from bwamem_tpu.engine.pipeline_device import regs_batch_fused
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


def _oracle(opt, eng, read):
    intervals = collect_intv(opt, eng.fm, read)
    chains = chain_flt(
        opt, mem_chain(opt, eng.fm, eng.idx.bns, len(read), intervals, None)
    )
    flt_chained_seeds(opt, eng.idx, len(read), read, chains)
    regs = []
    for c in chains:
        chain2aln(opt, eng.idx, len(read), read, c, regs)
    return regs


def _cmp_all(opt, eng, reads, ctx):
    got = regs_batch_fused(opt, eng, reads)
    for i, (r, g) in enumerate(zip(reads, got)):
        want = _oracle(opt, eng, r)
        assert len(g) == len(want), (ctx, i, len(g), len(want))
        for a, b in zip(g, want):
            for f in ("rb", "re", "qb", "qe", "rid", "score", "truesc",
                      "w", "seedcov", "seedlen0"):
                assert getattr(a, f) == getattr(b, f), (ctx, i, f, a, b)


@pytest.fixture(scope="module")
def eng_repeat():
    rng = np.random.default_rng(17)
    motif = rng.integers(0, 4, 60).astype(np.uint8)
    parts = []
    for _ in range(400):
        parts.append(motif)
        parts.append(rng.integers(0, 4, 25).astype(np.uint8))
    parts.append(rng.integers(0, 4, 30_000).astype(np.uint8))
    codes = np.concatenate(parts)
    return Engine(build_index(Fasta([FastaContig("rep", "", codes)]))), motif


@pytest.fixture(scope="module")
def eng_tiny_contigs():
    rng = np.random.default_rng(19)
    contigs = [
        FastaContig(f"t{i}", "", rng.integers(0, 4, n).astype(np.uint8))
        for i, n in enumerate((900, 450, 12_000, 300))
    ]
    return Engine(build_index(Fasta(contigs)))


def test_repeat_field_overflow_demotes_exactly(eng_repeat):
    eng, motif = eng_repeat
    opt = MemOptions()
    rng = np.random.default_rng(23)
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    # reads fully inside the repeat field: hundreds of occurrences each
    for _ in range(10):
        s = int(rng.integers(0, 30_000))
        reads.append(fwd[s : s + 120].copy())
    # plus unique-region reads in the same batch (mixed-batch decode)
    for _ in range(10):
        s = int(rng.integers(len(fwd) - 28_000, len(fwd) - 200))
        reads.append(fwd[s : s + 150].copy())
    _cmp_all(opt, eng, reads, "repeat field")


def test_nondefault_options_statics(eng_tiny_contigs):
    eng = eng_tiny_contigs
    opt = MemOptions()
    opt.w = 50
    opt.zdrop = 25
    opt.pen_clip5 = 2
    opt.pen_clip3 = 9
    opt.min_seed_len = 15
    opt.max_occ = 40
    rng = np.random.default_rng(29)
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    for _ in range(40):
        L = int(rng.integers(40, 151))
        s = int(rng.integers(0, len(fwd) - L))
        r = fwd[s : s + L].copy()
        for p in rng.integers(0, L, rng.integers(0, 6)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.integers(0, 2):
            r = np.where(r < 4, 3 - r, 4)[::-1].copy()
        reads.append(r)
    _cmp_all(opt, eng, reads, "nondefault opts")


def test_contig_boundary_reads(eng_tiny_contigs):
    eng = eng_tiny_contigs
    opt = MemOptions()
    bns = eng.idx.bns
    fwd = eng.idx.get_seq(0, bns.l_pac)
    reads = []
    # reads straddling every contig junction (split chains, window clamps)
    for a in bns.anns:
        for off in (-80, -40, -10):
            s = a.offset + a.length + off
            if 0 <= s and s + 100 <= bns.l_pac:
                reads.append(fwd[s : s + 100].copy())
    # first/last positions of the genome
    reads.append(fwd[:90].copy())
    reads.append(fwd[-90:].copy())
    reads.append(np.where(fwd[-120:] < 4, 3 - fwd[-120:], 4)[::-1].copy())
    _cmp_all(opt, eng, reads, "contig boundaries")
