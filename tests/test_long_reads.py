"""Long-read (250-700bp) and chimeric-read behavior + larger-reference fuzz
(the BASELINE.json "250-400bp reads ... wide SW bands and chimeric splits"
config, scaled for CI)."""
import numpy as np
import pytest

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_regs_batch, align_se
from bwamem_tpu.engine.finalize import mark_primary_se
from bwamem_tpu.engine.pipeline import reg2sam_records
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.encoding import revcomp_codes
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def eng():
    rng = np.random.default_rng(99)
    codes = rng.integers(0, 4, 100_000).astype(np.uint8)
    return Engine(build_index(Fasta([FastaContig("big", "", codes)])))


def cigar_str(c):
    return "".join(f"{ln}{'MIDSH'[op]}" for op, ln in c)


def test_long_reads_with_indels(eng):
    rng = np.random.default_rng(7)
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    opt = MemOptions()
    for rlen in (250, 400):
        start = int(rng.integers(0, len(ref) - rlen - 20))
        r = ref[start : start + rlen].copy()
        # a 10bp deletion mid-read (wide band exercise)
        pos = rlen // 2
        r = np.concatenate([r[:pos], r[pos + 10 :], ref[start + rlen : start + rlen + 10]])
        alns = align_se(opt, eng, r, 0)
        assert len(alns) == 1
        a = alns[0]
        assert a.pos == start
        assert f"10D" in cigar_str(a.cigar)
        assert a.NM == 10


def test_chimeric_split_supplementary(eng):
    """Two distant loci joined -> primary + supplementary with SA-style
    split, exact soft-clip bookkeeping."""
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    opt = MemOptions()
    read = np.concatenate([ref[1000:1200], revcomp_codes(ref[50000:50200])])
    alns = align_se(opt, eng, read, 0)
    assert len(alns) == 2
    primary, supp = alns
    assert not (primary.flag & 0x800) and (supp.flag & 0x800)
    spans = set()
    for a in alns:
        clip5 = a.cigar[0][1] if a.cigar[0][0] == 3 else 0
        m = sum(ln for op, ln in a.cigar if op in (0, 1))
        if a.is_rev:
            spans.add((len(read) - clip5 - m, len(read) - clip5))
        else:
            spans.add((clip5, clip5 + m))
    assert (0, 200) in spans and (200, 400) in spans


def test_700bp_read_triggers_seed_filter(eng):
    """>=700bp activates mem_flt_chained_seeds; alignment must still be
    clean full-length."""
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    opt = MemOptions()
    rng = np.random.default_rng(11)
    start = 30000
    r = ref[start : start + 800].copy()
    for p in rng.integers(0, 800, 8):
        r[p] = (r[p] + 1) % 4
    alns = align_se(opt, eng, r, 0)
    assert len(alns) == 1
    assert alns[0].pos == start
    assert cigar_str(alns[0].cigar) == "800M"


def test_fuzz_batch_vs_oracle(eng):
    """Batched pipeline == per-read oracle on messy reads, larger reference."""
    rng = np.random.default_rng(13)
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    opt = MemOptions()
    reads = []
    for _ in range(40):
        rlen = int(rng.integers(80, 300))
        start = int(rng.integers(0, len(ref) - rlen - 10))
        r = ref[start : start + rlen].copy()
        for p in rng.integers(0, rlen, rng.binomial(rlen, 0.02)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.4:
            pos = int(rng.integers(10, rlen - 10))
            ln = int(rng.integers(1, 6))
            if rng.random() < 0.5:
                r = np.concatenate([r[:pos], r[pos + ln :]])
            else:
                r = np.concatenate(
                    [r[:pos], rng.integers(0, 4, ln).astype(np.uint8), r[pos:]]
                )
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        reads.append(r)
    batched = align_regs_batch(opt, eng, reads)
    for q, got in zip(reads, batched):
        exp = align1_regs(opt, eng, q)
        assert len(got) == len(exp)
        for a, b in zip(got, exp):
            assert (a.rb, a.re, a.qb, a.qe, a.score, a.truesc) == (
                b.rb, b.re, b.qb, b.qe, b.score, b.truesc
            )


def test_fuzz_full_records(eng):
    """End-to-end record stability: flags/pos/CIGAR reconstruct the read."""
    rng = np.random.default_rng(29)
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    opt = MemOptions()
    n_checked = 0
    for _ in range(30):
        rlen = 150
        start = int(rng.integers(0, len(ref) - rlen))
        r = ref[start : start + rlen].copy()
        for p in rng.integers(0, rlen, 2):
            r[p] = (r[p] + 1) % 4
        alns = align_se(opt, eng, r, 0)
        a = alns[0]
        assert not (a.flag & 0x4)
        assert abs(a.pos - start) <= 5
        # NM must equal the real mismatch count when cigar is all-M
        if len(a.cigar) == 1 and a.cigar[0][0] == 0 and a.pos == start:
            true_mm = int((ref[start : start + rlen] != r).sum())
            assert a.NM == true_mm
            n_checked += 1
    assert n_checked >= 15
