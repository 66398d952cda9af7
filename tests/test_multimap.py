"""Multi-mapping behavior: XA alternative hits, MEM_F_ALL secondaries,
mapq collapse on repeats ([EXT] mem_gen_alt / mem_mark_primary_se)."""
import numpy as np
import pytest

from bwamem_tpu import BwaMemAligner, BwaMemIndex, MEM_F_ALL
from bwamem_tpu.index import image
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def rep_index(tmp_path_factory):
    """20kb reference containing the same 300bp block at two loci."""
    rng = np.random.default_rng(555)
    codes = rng.integers(0, 4, 20_000).astype(np.uint8)
    block = codes[2_000:2_300].copy()
    codes[12_000:12_300] = block  # exact duplicate
    img = str(tmp_path_factory.mktemp("rep") / "rep.img")
    image.write_image(img, build_index(Fasta([FastaContig("rep", "", codes)])))
    idx = BwaMemIndex(img)
    yield codes, idx
    idx.close()


def _read_from_block(codes):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return bytes(bases[codes[2_050:2_200]])


def test_xa_tag_lists_alternate_locus(rep_index):
    codes, idx = rep_index
    aligner = BwaMemAligner(idx)
    recs = aligner.align_seqs([_read_from_block(codes)])
    assert len(recs[0]) == 1  # one primary record, alternate in XA
    a = recs[0][0]
    assert not (a.sam_flag & 0x4)
    assert a.ref_start in (2_050, 12_050)
    assert a.map_qual == 0  # two perfect hits -> no confidence
    assert a.xa_tag is not None
    other = 12_050 if a.ref_start == 2_050 else 2_050
    assert f"rep,+{other + 1},150M,0;" == a.xa_tag


def test_mem_f_all_emits_secondary_records(rep_index):
    codes, idx = rep_index
    aligner = BwaMemAligner(idx)
    aligner.setFlagOption(aligner.getFlagOption() | MEM_F_ALL)
    recs = aligner.align_seqs([_read_from_block(codes)])
    alns = recs[0]
    assert len(alns) == 2
    primary = [a for a in alns if not (a.sam_flag & 0x100)]
    secondary = [a for a in alns if a.sam_flag & 0x100]
    assert len(primary) == 1 and len(secondary) == 1
    assert {primary[0].ref_start, secondary[0].ref_start} == {2_050, 12_050}
    assert primary[0].xa_tag is None  # MEM_F_ALL suppresses XA generation


def test_pe_xa_on_repeat_end(rep_index):
    """Pair-mode output carries XA for an end landing in the repeat
    (mem_sam_pe's paired branch runs mem_gen_alt per end)."""
    codes, idx = rep_index
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    r1 = bytes(bases[codes[2_050:2_200]])  # in the repeat
    m = codes[2_350:2_500]  # unique mate, proper FR distance
    r2 = bytes(bases[(3 - m)[::-1]])
    aligner = BwaMemAligner(idx)
    aligner.align_pairs()
    from bwamem_tpu import BwaMemPairEndStats

    aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(450, 45))
    recs = aligner.align_seqs([r1, r2])
    a1, a2 = recs[0][0], recs[1][0]
    assert a1.sam_flag & 0x2 and a2.sam_flag & 0x2  # paired properly
    # pairing anchors the repeat end to the locus near its mate, overriding
    # the hash-chosen SE primary (which here is the 12050 copy) — so the
    # emitted record is the ex-secondary: its mapq is pair-capped and, per
    # bwa's faithful quirk, the XA string stays attached to the ex-primary's
    # index and is not emitted
    assert a1.ref_start == 2_050
    assert a1.map_qual == 40  # raw_mapq-capped paired confidence
    assert a2.map_qual == 60
    assert a2.xa_tag is None
    assert a1.template_len == 450 and a2.template_len == -450


def test_unique_read_keeps_high_mapq(rep_index):
    codes, idx = rep_index
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    read = bytes(bases[codes[5_000:5_150]])
    a = BwaMemAligner(idx).align_seqs([read])[0][0]
    assert a.ref_start == 5_000
    assert a.map_qual == 60
    assert a.xa_tag is None
