"""Binary wire-format codec tests (the reference's buffer contracts)."""
import struct

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
from bwamem_tpu.api import wire

READ_L1 = b"GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
READ_P2 = b"TTGTTTTTAACACCAGAGTCATCCATCACATAATCAAATTTACTTTTAACTCTGGTAAATACTTCATTGT"


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    img = str(tmp_path_factory.mktemp("wire") / "ref.img")
    BwaMemIndex.create_index_image_from_index_files(
        f"{REFERENCE_RESOURCES}/ref.fa", img
    )
    idx = BwaMemIndex(img)
    yield idx
    idx.close()


def test_seq_buffer_roundtrip():
    seqs = [b"ACGT", b"", b"TTTTTT"]
    buf = wire.encode_seqs(seqs)
    assert buf[:4] == struct.pack("<i", 3)
    assert wire.decode_seqs(buf) == seqs


def test_contig_names_roundtrip(index):
    names = index.get_reference_contig_names()
    buf = wire.encode_contig_names(names)
    # layout check per org_..._BwaMemIndex.c:94-99
    assert struct.unpack_from("<i", buf, 0)[0] == 1
    assert struct.unpack_from("<i", buf, 4)[0] == len("rotavirus")
    assert wire.decode_contig_names(buf) == ["rotavirus"]


def test_packed_alignment_matches_object_api(index):
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(200, 10, 1, 600))
    obj = aligner.align_seqs([READ_L1, READ_P2])
    buf = aligner.align_seqs_packed(wire.encode_seqs([READ_L1, READ_P2]))
    dec = wire.decode_alignments(buf, 2)
    assert len(dec) == 2
    for got_list, exp_list in zip(dec, obj):
        assert len(got_list) == len(exp_list)
        for g, e in zip(got_list, exp_list):
            assert g == e  # full record equality through the wire


def test_packed_unmapped_and_se(index):
    aligner = BwaMemAligner(index)
    rng = np.random.default_rng(3)
    junk = bytes(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 70)]
    )
    obj = aligner.align_seqs([READ_L1, junk])
    buf = aligner.align_seqs_packed(wire.encode_seqs([READ_L1, junk]))
    dec = wire.decode_alignments(buf, 2)
    assert dec[0][0] == obj[0][0]
    assert dec[1][0].sam_flag & 0x4
    assert dec[1][0] == obj[1][0]
