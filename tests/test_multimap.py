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


def test_unique_read_keeps_high_mapq(rep_index):
    codes, idx = rep_index
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    read = bytes(bases[codes[5_000:5_150]])
    a = BwaMemAligner(idx).align_seqs([read])[0][0]
    assert a.ref_start == 5_000
    assert a.map_qual == 60
    assert a.xa_tag is None
