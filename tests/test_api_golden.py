"""API-surface golden tests — the full BwaMemIndexTest.java, re-hosted.

Every case mirrors the reference test class (BwaMemIndexTest.java): image
creation from the checked-in index files, option-size tripwire, the four
single-end golden alignments, the paired-end trio of PE-stats modes with
exact flags/mate/tlen, and the 2-contig random-FASTA index round-trip over
all three algorithm selectors.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu import (
    Algorithm,
    BwaMemAligner,
    BwaMemIndex,
    BwaMemPairEndStats,
)

READ_L1 = b"GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
READ_SNV = b"GGCTTTTAATGCTTTTCAGTGCTAGGTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
READ_RC = b"AATAATAGAGCTTACCATCTGCTGAGTAGACTCCATCTTGAGCAGCAACCACTGAAAAGCATTAAAAGCC"
READ_DEL = b"AATACTTCTTTTGAAGCTGCAGTTGTTGCTGCCTTCAACATTAGAATTAATGGGTATTCAATATGATT"
READ_P2 = b"TTGTTTTTAACACCAGAGTCATCCATCACATAATCAAATTTACTTTTAACTCTGGTAAATACTTCATTGT"


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    img = str(tmp_path_factory.mktemp("img") / "ref.fa.img")
    # openIndex() equivalent (BwaMemIndexTest.java:27-33): build the image
    # from the checked-in bwa index files, then open it
    BwaMemIndex.create_index_image_from_index_files(
        f"{REFERENCE_RESOURCES}/ref.fa", img
    )
    idx = BwaMemIndex(img)
    yield idx
    idx.close()


def check(a, ref_start, ref_end, seq_start, seq_end, cigar, nm, flag):
    """testAlignment helper (BwaMemIndexTest.java:129-140)."""
    assert a.ref_start == ref_start
    assert a.ref_end == ref_end
    assert a.seq_start == seq_start
    assert a.seq_end == seq_end
    assert a.cigar == cigar
    assert a.n_mismatches == nm
    assert a.ref_id == 0
    assert a.sam_flag == flag


def test_opts_size(index):
    with BwaMemAligner(index) as aligner:
        assert aligner.get_opts_size() == aligner.get_expected_opts_size()


def test_simple(index):
    aligner = BwaMemAligner(index)
    alignments = aligner.align_seqs([READ_L1])
    assert len(alignments) == 1
    assert len(alignments[0]) == 1
    check(alignments[0][0], 0, 70, 0, 70, "70M", 0, 0)


def test_multi(index):
    aligner = BwaMemAligner(index)
    alignments = aligner.align_seqs([READ_SNV, READ_RC, READ_DEL])
    assert [len(a) for a in alignments] == [1, 1, 1]
    check(alignments[0][0], 0, 70, 0, 70, "70M", 3, 0)
    check(alignments[1][0], 0, 70, 0, 70, "70M", 0, 0x10)
    check(alignments[2][0], 70, 140, 0, 68, "32M2D36M", 2, 0)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_pair(index, mode):
    """testPair (BwaMemIndexTest.java:84-118), all three PE-stats modes."""
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    if mode == 1:
        aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(200, 10, 1, 600))
    elif mode == 2:
        aligner.dont_infer_pair_end_stats()
    else:
        aligner.infer_pair_end_stats()
    alignments = aligner.align_seqs([READ_L1, READ_P2])
    assert len(alignments) == 2
    a0 = alignments[0]
    assert len(a0) == 1
    check(a0[0], 0, 70, 0, 70, "70M", 0, 0x63 if mode == 1 else 0x61)
    assert a0[0].mate_ref_start == 140
    assert a0[0].template_len == 210
    a1 = alignments[1]
    assert len(a1) == 1
    check(a1[0], 140, 210, 0, 70, "70M", 0, 0x93 if mode == 1 else 0x91)
    assert a1[0].mate_ref_start == 0
    assert a1[0].template_len == -210


@pytest.mark.parametrize("alg", list(Algorithm))
def test_index_reference(tmp_path, alg):
    """testIndexReference (BwaMemIndexTest.java:142-177)."""
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq1 = bases[rng.integers(0, 4, 45212)].tobytes().decode()
    seq2 = bases[rng.integers(0, 4, 13415)].tobytes().decode()
    fasta = tmp_path / "test.fasta"
    with open(fasta, "w") as fh:
        fh.write(">seq1\n")
        for i in range(0, len(seq1), 60):
            fh.write(seq1[i : i + 60] + "\n")
        fh.write(">seq2\n")
        for i in range(0, len(seq2), 60):
            fh.write(seq2[i : i + 60] + "\n")
    img = str(fasta) + ".idx"
    BwaMemIndex.create_index_image_from_fasta_file(str(fasta), img, alg)
    index = BwaMemIndex(img)
    assert index.get_reference_contig_names() == ["seq1", "seq2"]
    # beyond the Java test: reads from each contig must align back to it
    with BwaMemAligner(index) as aligner:
        r1 = seq1[1000:1100].encode()
        r2 = seq2[2000:2100].encode()
        alns = aligner.align_seqs([r1, r2])
        assert alns[0][0].ref_id == 0 and alns[0][0].ref_start == 1000
        assert alns[1][0].ref_id == 1 and alns[1][0].ref_start == 2000
        assert alns[0][0].cigar == "100M" and alns[1][0].cigar == "100M"
    index.close()


def test_close_guard(index):
    """Index refuses to close while an aligner holds a reference
    (BwaMemIndex.java:382-397)."""
    index.ref_index()
    with pytest.raises(RuntimeError):
        index.close()
    index.de_ref_index()


def test_java_style_accessors(index):
    with BwaMemAligner(index) as a:
        assert a.getMatchScoreOption() == 1
        a.setMismatchPenaltyOption(9)
        assert a.getMismatchPenaltyOption() == 9
        assert a.options.mat[1] == -9  # matrix refreshed
        assert a.getBandwidthOption() == 100
        assert len(a.getScoringMatrixOption()) == 25
