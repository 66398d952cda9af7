"""ALT-contig pipeline tests ([EXT] bntseq.c bns_restore .alt handling,
bwamem.c mem_mark_primary_se ALT branch, bwamem_extra.c mem_gen_alt,
mem_aln2sam XS/pa emission).

The reference engine loads ``{prefix}.alt``, marks those contigs is_alt, and
then: ALT hits never outrank primary-assembly hits for the SAM primary
record, a better-scoring ALT shadow is recorded in alt_sc (surfacing as
XS/pa:f), and ALT placements are reported via XA.
"""
import numpy as np
import pytest

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.api.sam import aln2sam
from bwamem_tpu.engine.extend import AlnReg
from bwamem_tpu.engine.finalize import SECONDARY_INT_MAX, mark_primary_se
from bwamem_tpu.engine.pipeline import Engine, align_se
from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def alt_index(tmp_path_factory):
    """chr: 2000bp; chr_alt: a copy of chr[500:800] with one divergent base
    at block offset 150, plus a 300bp unique tail."""
    rng = np.random.default_rng(777)
    chrom = rng.integers(0, 4, 2000).astype(np.uint8)
    block = chrom[500:800].copy()
    block[150] = (block[150] + 1) % 4  # ALT haplotype divergence
    tail = rng.integers(0, 4, 300).astype(np.uint8)
    alt = np.concatenate([block, tail])
    idx0 = build_index(
        Fasta([FastaContig("chr", "", chrom), FastaContig("chr_alt", "", alt)])
    )
    idx0.bns.anns[1].is_alt = 1
    prefix = str(tmp_path_factory.mktemp("alt") / "ref")
    bwtfile.write_index_files(prefix, idx0)
    idx = bwtfile.read_index_files(prefix)  # exercises .alt parsing
    return Engine(idx), chrom, alt


def test_alt_file_round_trip(alt_index):
    eng, _, _ = alt_index
    assert eng.idx.bns.anns[0].is_alt == 0
    assert eng.idx.bns.anns[1].is_alt == 1


def test_alt_file_sam_lines_ignored(tmp_path):
    rng = np.random.default_rng(3)
    idx = build_index(Fasta([
        FastaContig("a", "", rng.integers(0, 4, 300).astype(np.uint8)),
        FastaContig("b", "", rng.integers(0, 4, 300).astype(np.uint8)),
    ]))
    p = tmp_path / "x.alt"
    p.write_text("@SQ\tSN:a\tLN:300\nb\t4\t*\t0\t0\t*\t*\t0\t0\nnope\t0\n")
    bwtfile.read_alt_into(str(p), idx.bns)
    assert idx.bns.anns[0].is_alt == 0  # @-line skipped
    assert idx.bns.anns[1].is_alt == 1
    # unknown contig name silently ignored (bns_restore behavior)


def test_primary_assembly_wins_equal_alt(alt_index):
    """A read matching chr and chr_alt equally must be primary on chr with
    full mapq (ALT shadow doesn't demote it), ALT placement in XA."""
    eng, chrom, alt = alt_index
    opt = MemOptions()
    read = chrom[510:580].copy()  # inside the duplicated block, before the SNV
    alns = align_se(opt, eng, read, 0)
    pri = [a for a in alns if not (a.flag & 0x100)]
    assert len(pri) == 1
    a = pri[0]
    assert eng.idx.bns.anns[a.rid].name == "chr"
    assert a.is_alt == 0
    assert a.mapq > 0, "ALT shadow must not zero the primary mapq"
    assert a.XA and "chr_alt," in a.XA


def test_alt_sc_and_pa_when_alt_scores_higher(alt_index):
    """Read carrying the ALT haplotype base: the ALT hit scores higher, but
    the chr hit is still the SAM primary; the better ALT placement comes out
    as a supplementary record (bwa's documented ALT reporting), and alt_sc
    on the primary drives XS and pa:f."""
    eng, chrom, alt = alt_index
    opt = MemOptions()
    read = alt[100:170].copy()  # contains divergent base at offset 50
    alns = align_se(opt, eng, read, 0)
    assert len(alns) == 2
    a = alns[0]
    assert not (a.flag & (0x100 | 0x800))  # the SAM primary
    assert eng.idx.bns.anns[a.rid].name == "chr"
    assert a.NM == 1  # one mismatch vs the primary assembly
    assert a.alt_sc == 70  # perfect ALT score recorded on the primary
    assert a.score < a.alt_sc
    supp = alns[1]
    assert supp.flag & 0x800 and supp.is_alt == 1
    assert eng.idx.bns.anns[supp.rid].name == "chr_alt"
    assert supp.mapq > 0  # ALT supplementaries keep their own mapq
    line = aln2sam(opt, eng.idx.bns.anns, "r", read, None, a, 0, records=alns)
    assert f"XS:i:{a.alt_sc}" in line
    assert "\tpa:f:" in line


def test_alt_only_read_maps_to_alt(alt_index):
    eng, chrom, alt = alt_index
    opt = MemOptions()
    read = alt[350:420].copy()  # unique ALT tail
    alns = align_se(opt, eng, read, 0)
    assert len(alns) == 1
    a = alns[0]
    assert eng.idx.bns.anns[a.rid].name == "chr_alt"
    assert a.is_alt == 1
    assert not (a.flag & 0x100)
    # ALT alignments always soft-clip in SAM (mem_aln2sam is_alt branch)
    line = aln2sam(opt, eng.idx.bns.anns, "r", read, None, a, 1, records=alns)
    assert "H" not in line.split("\t")[5]


def test_mark_primary_se_alt_higher_scoring():
    """ALT hit outscoring the primary: the primary-assembly hit still ends up
    unshadowed (secondary=-1) with alt_sc recording the ALT score; the
    top-scoring ALT hit keeps secondary=-1 (it becomes a supplementary
    record, never INT_MAX — only *shadowed* ALT hits get the sentinel)."""
    opt = MemOptions()
    pri = AlnReg(rb=0, re=70, qb=0, qe=70, rid=0, score=65, truesc=65,
                 seedcov=35)
    alt = AlnReg(rb=1000, re=1070, qb=0, qe=70, rid=1, score=70, truesc=70,
                 seedcov=35, is_alt=1)
    regs = [pri, alt]
    n_pri = mark_primary_se(opt, regs, 7)
    assert n_pri == 1
    # after hash2 re-sort the non-ALT hit leads despite the lower score
    assert regs[0] is pri and regs[1] is alt
    assert pri.secondary == -1 and pri.alt_sc == 70
    assert alt.secondary == -1 and alt.secondary_all == -1


def test_mark_primary_se_shadowed_alt_gets_sentinel():
    """An ALT hit shadowed by a better primary hit becomes an unconditional
    secondary (INT_MAX sentinel) with secondary_all pointing at the primary
    for XA grouping."""
    opt = MemOptions()
    pri = AlnReg(rb=0, re=70, qb=0, qe=70, rid=0, score=70, truesc=70,
                 seedcov=35)
    alt = AlnReg(rb=1000, re=1070, qb=0, qe=70, rid=1, score=65, truesc=65,
                 seedcov=35, is_alt=1)
    regs = [pri, alt]
    n_pri = mark_primary_se(opt, regs, 7)
    assert n_pri == 1
    assert regs[0] is pri and regs[1] is alt
    assert pri.secondary == -1 and pri.alt_sc == 0
    assert alt.secondary == SECONDARY_INT_MAX
    assert alt.secondary_all == 0


def test_primary5_reorders_split_alignment(rota_eng=None):
    """MEM_F_PRIMARY5: the 5'-most primary hit becomes the SAM primary
    record ([EXT] mem_reorder_primary5)."""
    from conftest import REFERENCE_RESOURCES
    from bwamem_tpu.api.options import MEM_F_PRIMARY5

    eng = Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    read = np.concatenate([fwd[0:60], fwd[500:560]])
    opt = MemOptions(flag=MEM_F_PRIMARY5)
    alns = align_se(opt, eng, read, 0)
    assert len(alns) >= 2
    assert alns[0].pos == 0  # the qb==0 half leads regardless of hash order
    assert not (alns[0].flag & 0x800) and alns[1].flag & 0x800
