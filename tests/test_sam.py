"""SAM text emission tests (mem_aln2sam semantics)."""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MEM_F_ALL, MEM_F_SOFTCLIP, MemOptions
from bwamem_tpu.api.sam import aln2sam, sam_header
from bwamem_tpu.engine.pipeline import Engine, align_se
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import revcomp_codes, seq_to_codes

READ_L1 = "GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def test_header(eng):
    hdr = sam_header(eng.idx.bns.anns)
    assert hdr.startswith("@SQ\tSN:rotavirus\tLN:1074\n")
    assert "@PG" in hdr


def test_simple_sam_line(eng):
    opt = MemOptions()
    codes = seq_to_codes(READ_L1)
    aln = align_se(opt, eng, codes, 0)[0]
    line = aln2sam(opt, eng.idx.bns.anns, "read1", codes, None, aln, 0)
    f = line.split("\t")
    assert f[0] == "read1"
    assert f[1] == "0"
    assert f[2] == "rotavirus"
    assert f[3] == "1"  # 1-based
    assert f[4] == "60"
    assert f[5] == "70M"
    assert f[6:9] == ["*", "0", "0"]
    assert f[9] == READ_L1
    assert f[10] == "*"
    assert "NM:i:0" in line and "MD:Z:70" in line and "AS:i:70" in line
    assert "XS:i:0" in line


def test_reverse_strand_seq_flipped(eng):
    opt = MemOptions()
    rc = revcomp_codes(seq_to_codes(READ_L1))
    aln = align_se(opt, eng, rc, 0)[0]
    assert aln.flag & 0x10
    line = aln2sam(opt, eng.idx.bns.anns, "r", rc, "I" * 70, aln, 0)
    f = line.split("\t")
    # SEQ is emitted on the forward reference strand
    assert f[9] == READ_L1
    assert f[10] == "I" * 70


def test_unmapped_line(eng):
    opt = MemOptions()
    codes = np.random.default_rng(5).integers(0, 4, 70).astype(np.uint8)
    aln = align_se(opt, eng, codes, 0)[0]
    assert aln.flag & 0x4
    line = aln2sam(opt, eng.idx.bns.anns, "u", codes, None, aln, 0)
    f = line.split("\t")
    assert f[1] == "4"
    assert f[2] == "*" and f[3] == "0" and f[5] == "*"


def test_supplementary_hard_clip(eng):
    """A chimeric read (two halves from distant loci) yields a supplementary
    alignment whose clip becomes H and whose SEQ is trimmed (which>0,
    no MEM_F_SOFTCLIP)."""
    opt = MemOptions()
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    read = np.concatenate([fwd[0:60], fwd[500:560]])
    alns = align_se(opt, eng, read, 0)
    assert len(alns) >= 2, "expected a split alignment"
    assert alns[1].flag & 0x800  # supplementary
    line0 = aln2sam(opt, eng.idx.bns.anns, "c", read, None, alns[0], 0)
    line1 = aln2sam(opt, eng.idx.bns.anns, "c", read, None, alns[1], 1)
    assert "S" in line0.split("\t")[5]  # primary soft-clips
    assert "H" in line1.split("\t")[5]  # supplementary hard-clips
    assert len(line1.split("\t")[9]) < len(read)  # trimmed SEQ
    # with MEM_F_SOFTCLIP everything soft-clips
    opt2 = MemOptions(flag=MEM_F_SOFTCLIP)
    line1s = aln2sam(opt2, eng.idx.bns.anns, "c", read, None, alns[1], 1)
    assert "H" not in line1s.split("\t")[5]
    assert len(line1s.split("\t")[9]) == len(read)


def test_secondary_line_no_seq(eng):
    opt = MemOptions(flag=MEM_F_ALL)
    # a read from a quasi-repeat won't exist in rotavirus; fabricate a
    # secondary record instead
    codes = seq_to_codes(READ_L1)
    aln = align_se(opt, eng, codes, 0)[0]
    from dataclasses import replace
    import copy

    sec = copy.deepcopy(aln)
    sec.flag |= 0x100
    line = aln2sam(opt, eng.idx.bns.anns, "s", codes, None, sec, 1)
    f = line.split("\t")
    assert int(f[1]) & 0x100
    assert f[9] == "*" and f[10] == "*"
