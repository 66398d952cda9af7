"""The memory-frugal (Algorithm.RB2) index builder.

The reference reserves RB2 (ropebwt2; BwaMemIndex.java:66-71, Makefile:27)
for >2 GB references where the in-RAM IS builder's memory is prohibitive.
Our equivalent is the 40-bit packed-SA / 2-bit-text SA-IS top level
(index/native/sais40.cpp): same output, bounded memory.  These tests pin
byte-identity against the in-RAM builder across sizes and through the
public image surface.
"""
import os

import numpy as np
import pytest

from bwamem_tpu.index import native_sais
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig

pytestmark = pytest.mark.skipif(
    not native_sais.available(), reason="native builder unavailable"
)


def _fasta(codes):
    return Fasta([FastaContig("c", "", np.asarray(codes, dtype=np.uint8))])


@pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 255, 256, 1000, 4097, 20000])
def test_frugal_matches_inram(n):
    for seed in (0, 1):
        rng = np.random.default_rng(1000 * n + seed)
        codes = rng.integers(0, 4, n).astype(np.uint8)
        if seed == 1 and n >= 8:  # repeat-rich: deep recursion
            codes = np.tile(codes[: max(1, n // 7)], 8)[:n].astype(np.uint8)
        a = build_index(_fasta(codes), algo="is")
        b = build_index(_fasta(codes), algo="rb2")
        assert a.bwt.primary == b.bwt.primary
        assert np.array_equal(a.bwt.bwt, b.bwt.bwt)
        assert np.array_equal(a.bwt.sa, b.bwt.sa)
        assert np.array_equal(a.bwt.L2, b.bwt.L2)


def test_frugal_with_ambiguous_and_multicontig():
    rng = np.random.default_rng(7)
    c1 = rng.integers(0, 4, 777).astype(np.uint8)
    c1[100:130] = 4  # N-hole: lrand48 replacement must match across builders
    c2 = rng.integers(0, 4, 333).astype(np.uint8)
    fa_is = Fasta([FastaContig("a", "", c1.copy()), FastaContig("b", "", c2.copy())])
    fa_rb = Fasta([FastaContig("a", "", c1.copy()), FastaContig("b", "", c2.copy())])
    a = build_index(fa_is, algo="is")
    b = build_index(fa_rb, algo="rb2")
    assert np.array_equal(a.bwt.bwt, b.bwt.bwt)
    assert np.array_equal(a.bwt.sa, b.bwt.sa)
    assert np.array_equal(np.asarray(a.pac), np.asarray(b.pac))


def test_consume_releases_and_matches():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, 2000).astype(np.uint8)
    fa = _fasta(codes.copy())
    a = build_index(fa, algo="rb2", consume=True)
    assert fa.contigs[0].codes is None  # released during construction
    b = build_index(_fasta(codes), algo="rb2")
    assert np.array_equal(a.bwt.bwt, b.bwt.bwt)
    assert np.array_equal(a.bwt.sa, b.bwt.sa)


@pytest.mark.skipif(
    os.environ.get("BWAMEM_TPU_SLOW_TESTS") != "1",
    reason="minutes-long scale test (BWAMEM_TPU_SLOW_TESTS=1)",
)
def test_frugal_matches_inram_5mbp():
    from bwamem_tpu.utils.synth import synthetic_genome

    codes = synthetic_genome(5_000_000, np.random.default_rng(11))
    a = build_index(_fasta(codes), algo="is")
    b = build_index(_fasta(codes), algo="rb2")
    assert a.bwt.primary == b.bwt.primary
    assert np.array_equal(a.bwt.bwt, b.bwt.bwt)
    assert np.array_equal(a.bwt.sa, b.bwt.sa)


def test_rb2_image_identical_via_public_api(tmp_path):
    from bwamem_tpu.api.index import Algorithm, BwaMemIndex

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    base = "ACGT"
    fasta_path = tmp_path / "r.fa"
    fasta_path.write_text(
        ">c desc\n" + "".join(base[c] for c in codes) + "\n"
    )
    img_is = str(tmp_path / "is.img")
    img_rb = str(tmp_path / "rb.img")
    BwaMemIndex.create_index_image_from_fasta_file(
        str(fasta_path), img_is, Algorithm.IS
    )
    BwaMemIndex.create_index_image_from_fasta_file(
        str(fasta_path), img_rb, Algorithm.RB2
    )
    assert open(img_is, "rb").read() == open(img_rb, "rb").read()
    # and the RB2-built image aligns
    idx = BwaMemIndex(img_rb)
    try:
        from bwamem_tpu.api.aligner import BwaMemAligner

        aligner = BwaMemAligner(idx)
        seq = "".join(base[c] for c in codes[100:200])
        recs = aligner.align_seqs([seq])[0]
        assert recs and recs[0].ref_start == 100
    finally:
        idx.close()
