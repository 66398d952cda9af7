"""Single-end golden parity tests.

Exact expectations transcribed from the reference's test suite
(BwaMemIndexTest.java testSimple :45-58 and testMulti :60-82): same reads,
same asserted flag/pos/CIGAR/NM values, run through our engine instead of
the JNI+libbwa stack.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.pipeline import Engine, align_se
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import seq_to_codes

READ_L1 = "GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
READ_SNV = "GGCTTTTAATGCTTTTCAGTGCTAGGTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
READ_RC = "AATAATAGAGCTTACCATCTGCTGAGTAGACTCCATCTTGAGCAGCAACCACTGAAAAGCATTAAAAGCC"
READ_DEL = "AATACTTCTTTTGAAGCTGCAGTTGTTGCTGCCTTCAACATTAGAATTAATGGGTATTCAATATGATT"


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def cigar_str(cigar):
    return "".join(f"{ln}{'MIDSH'[op]}" for op, ln in cigar)


def ref_span(cigar):
    return sum(ln for op, ln in cigar if op in (0, 2))


def seq_span(cigar):
    """(seqStart, seqEnd) like BwaMemAligner.java:256-283 derives them."""
    start = cigar[0][1] if cigar and cigar[0][0] == 3 else 0
    seqlen = sum(ln for op, ln in cigar if op in (0, 1))
    return start, start + seqlen


def check(aln, ref_start, ref_end, seq_start, seq_end, cigar, nm, flag):
    """Mirror of the shared assert helper (BwaMemIndexTest.java:129-140)."""
    assert aln.rid == 0
    assert aln.pos == ref_start
    assert aln.pos + ref_span(aln.cigar) == ref_end
    s, e = seq_span(aln.cigar)
    assert (s, e) == (seq_start, seq_end)
    assert cigar_str(aln.cigar) == cigar
    assert aln.NM == nm
    assert aln.flag == flag


def test_simple(eng):
    alns = align_se(MemOptions(), eng, seq_to_codes(READ_L1), 0)
    assert len(alns) == 1
    check(alns[0], 0, 70, 0, 70, "70M", 0, 0)


def test_multi(eng):
    opt = MemOptions()
    a = align_se(opt, eng, seq_to_codes(READ_SNV), 0)
    assert len(a) == 1
    check(a[0], 0, 70, 0, 70, "70M", 3, 0)
    a = align_se(opt, eng, seq_to_codes(READ_RC), 1)
    assert len(a) == 1
    check(a[0], 0, 70, 0, 70, "70M", 0, 0x10)
    a = align_se(opt, eng, seq_to_codes(READ_DEL), 2)
    assert len(a) == 1
    check(a[0], 70, 140, 0, 68, "32M2D36M", 2, 0)


def test_md_tags(eng):
    """MD strings (bwa_gen_cigar2 MD generation); beyond the Java tests'
    coverage but pinned by bwa semantics."""
    opt = MemOptions()
    assert align_se(opt, eng, seq_to_codes(READ_L1), 0)[0].md == "70"
    assert align_se(opt, eng, seq_to_codes(READ_SNV), 0)[0].md == "21G1T1C44"
    assert align_se(opt, eng, seq_to_codes(READ_DEL), 0)[0].md == "32^TA36"


def test_mapq_and_score(eng):
    opt = MemOptions()
    a = align_se(opt, eng, seq_to_codes(READ_L1), 0)[0]
    assert a.mapq == 60
    assert a.score == 70
    a = align_se(opt, eng, seq_to_codes(READ_SNV), 0)[0]
    assert a.score == 70 - 3 * (opt.a + opt.b)  # 3 mismatches
    a = align_se(opt, eng, seq_to_codes(READ_DEL), 0)[0]
    assert a.score == 68 - opt.o_del - 2 * opt.e_del


def test_unmapped_read(eng):
    """A read with no hit yields one unmapped record (flag 0x4), matching
    mem_reg2sam's unaligned-record path."""
    rng = np.random.default_rng(5)
    # random 70-mer is vanishingly unlikely to hit a 1kb reference with
    # min_seed_len 19
    read = rng.integers(0, 4, 70).astype(np.uint8)
    alns = align_se(MemOptions(), eng, read, 0)
    assert len(alns) == 1
    assert alns[0].flag & 0x4
    assert alns[0].rid == -1


def test_short_read_below_min_seed(eng):
    alns = align_se(MemOptions(), eng, seq_to_codes("ACGTACGT"), 0)
    assert len(alns) == 1
    assert alns[0].flag & 0x4
