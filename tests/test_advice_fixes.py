"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. mem_matesw must clamp the rescue window to the contig containing the
   window midpoint (bns_fetch_seq semantics) and skip SW when that contig
   differs from the anchor's — a junction-spanning window must not rescue
   a region in the neighboring contig labeled with the anchor's rid.
2. mem_sort_dedup_patch drops a hit as redundant only when the overlap
   exceeds mask_level_redun on BOTH axes (strict >).
3. mem_seed_sw's window guard is opt.w<<2, not MEM_SHORT_LEN.
4. mem_aln2sam emits SA:Z for split/supplementary alignments.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MEM_F_PE, MemOptions
from bwamem_tpu.api.sam import aln2sam
from bwamem_tpu.engine import pair as P
from bwamem_tpu.engine.chain import Seed, _seed_sw
from bwamem_tpu.engine.extend import AlnReg
from bwamem_tpu.engine.finalize import sort_dedup_patch
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_se
from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.encoding import revcomp_codes
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def rota_eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


@pytest.fixture(scope="module")
def two_contig():
    """Two 400bp contigs; contig B holds a decoy match for the mate."""
    rng = np.random.default_rng(99)
    a = rng.integers(0, 4, 400).astype(np.uint8)
    b = rng.integers(0, 4, 400).astype(np.uint8)
    idx = build_index(
        Fasta([FastaContig("ctgA", "", a), FastaContig("ctgB", "", b)])
    )
    return Engine(idx), a, b


def test_matesw_skips_junction_spanning_window(two_contig):
    """Anchor near the end of ctgA; the insert window crosses into ctgB where
    the mate matches.  bns_fetch_seq clamps to the midpoint's contig (ctgB),
    rid differs from the anchor's -> no rescue, and crucially no AlnReg with
    ctgB coordinates labeled rid=ctgA (which used to crash reg2aln)."""
    eng, a, b = two_contig
    opt = MemOptions(flag=MEM_F_PE)
    r1 = a[300:370].copy()
    r2 = revcomp_codes(b[100:170])  # matches abs [500,570), inside ctgB
    regs1 = align1_regs(opt, eng, r1)
    assert regs1 and regs1[0].rid == 0
    # kill the mate's own seeds so only rescue could place it
    m = r2.copy()
    for pos in range(5, 70, 12):
        m[pos] = (m[pos] + 1) % 4
    regs2 = align1_regs(opt, eng, m)
    regs2 = [r for r in regs2 if r.score >= opt.T]
    pes = P.default_pes()
    pes[1] = P.PeStat(low=1, high=600, failed=0, avg=200.0, std=50.0)
    n = P.matesw(opt, eng, pes, regs1[0], m, regs2)
    for r in regs2:
        # any region produced must carry a self-consistent rid
        fpos, _ = eng.idx.bns.depos(r.rb if r.rb < eng.idx.bns.l_pac else r.re - 1)
        assert eng.idx.bns.pos_to_rid(fpos) == r.rid
    # full PE output must not raise (used to AssertionError in reg2aln)
    P.sam_pe(opt, eng, pes, 0, (r1, m), [regs1, regs2])


def test_matesw_rescue_within_contig_still_works(two_contig):
    """Control: when the window midpoint stays in the anchor's contig the
    rescue proceeds exactly as before."""
    eng, a, b = two_contig
    opt = MemOptions(flag=MEM_F_PE)
    r1 = a[0:70].copy()
    m = a[200:270].copy()
    for pos in range(5, 70, 12):
        m[pos] = (m[pos] + 1) % 4
    r2 = revcomp_codes(m)
    regs1 = align1_regs(opt, eng, r1)
    regs2 = align1_regs(opt, eng, r2)
    assert regs1 and not regs2
    pes = P.default_pes()
    pes[1] = P.PeStat(low=1, high=330, failed=0, avg=250.0, std=30.0)
    n = P.matesw(opt, eng, pes, regs1[0], r2, regs2)
    assert n > 0 and regs2
    assert regs2[0].rid == 0


def test_dedup_requires_overlap_on_both_axes():
    """~95% reference overlap but only 2bp query overlap (split/inverted-
    repeat shape): the reference engine keeps both hits."""
    opt = MemOptions()
    q = AlnReg(rb=100, re=200, qb=0, qe=30, rid=0, score=50, truesc=50)
    p = AlnReg(rb=105, re=200, qb=28, qe=60, rid=0, score=40, truesc=40)
    out = sort_dedup_patch(opt, None, None, [q, p])
    assert len(out) == 2, "partially query-overlapping split hits must survive"


def test_dedup_still_drops_true_redundants():
    opt = MemOptions()
    q = AlnReg(rb=100, re=200, qb=0, qe=100, rid=0, score=90, truesc=90)
    p = AlnReg(rb=101, re=200, qb=1, qe=100, rid=0, score=80, truesc=80)
    out = sort_dedup_patch(opt, None, None, [q, p])
    assert len(out) == 1 and out[0].score == 90


def test_seed_sw_verifies_mid_length_seeds(rota_eng):
    """A 150bp seed inside a long read sits under the w<<2=400 window guard,
    so mem_seed_sw runs the SW (the old MEM_SHORT_LEN=200 guard skipped it)."""
    eng = rota_eng
    opt = MemOptions()
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    query = fwd[0:400].copy()
    s = Seed(rbeg=100, qbeg=100, len=150, score=0)
    score = _seed_sw(opt, eng.idx, len(query), query, s)
    assert score >= 0, "150bp seed must be SW-verified under the w<<2 guard"
    assert score == 250 * opt.a  # perfect 250bp window match
    # the seed-length early-out still applies
    s2 = Seed(rbeg=100, qbeg=100, len=250, score=0)
    assert _seed_sw(opt, eng.idx, len(query), query, s2) == -1


def test_sa_tag_on_split_alignment(rota_eng):
    eng = rota_eng
    opt = MemOptions()
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    read = np.concatenate([fwd[0:60], fwd[500:560]])
    alns = align_se(opt, eng, read, 0)
    assert len(alns) >= 2 and alns[1].flag & 0x800
    line0 = aln2sam(opt, eng.idx.bns.anns, "c", read, None, alns[0], 0,
                    records=alns)
    line1 = aln2sam(opt, eng.idx.bns.anns, "c", read, None, alns[1], 1,
                    records=alns)
    assert "\tSA:Z:" in line0 and "\tSA:Z:" in line1
    # each SA entry points at the other record: rname,pos,strand,CIGAR,mapQ,NM;
    sa0 = line0.split("SA:Z:")[1].split("\t")[0]
    f = sa0.rstrip(";").split(",")
    assert f[0] == "rotavirus" and int(f[1]) == alns[1].pos + 1
    assert f[2] in "+-" and f[4].isdigit() and f[5].isdigit()
    # secondary records never carry SA
    import copy

    sec = copy.deepcopy(alns[0])
    sec.flag |= 0x100
    line_sec = aln2sam(opt, eng.idx.bns.anns, "c", read, None, sec, 0,
                       records=alns)
    assert "SA:Z:" not in line_sec
