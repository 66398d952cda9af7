"""Record-level equivalence: full native pipeline tail (native/pipeline.cpp)
vs the python oracle path (engine/{finalize,pair,pipeline}.py).

Every field of every output record — flags, coords, mapq, NM, CIGAR, MD,
XA, scores — must match exactly across both paths, per the correctness
discipline (CLAUDE.md): every optimized tier stays bit-exact with the tier
below it.
"""
import os

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
from bwamem_tpu.engine import native_pipeline
from bwamem_tpu.index import bwtfile, image
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig

pytestmark = pytest.mark.skipif(
    not native_pipeline.available(), reason="native pipeline unavailable"
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rec_key(a):
    return (
        a.flag, a.rid, a.pos, a.is_rev, a.is_alt, a.mapq, a.NM,
        tuple(a.cigar), a.md, a.score, a.sub, a.alt_sc, a.XA,
    )


def _run_both(aligner_factory, reads, env_overrides=()):
    """Run align_seqs with the native tail on and off; return both outputs."""
    results = {}
    for tail in ("1", "0"):
        os.environ["BWAMEM_TPU_NATIVE_TAIL"] = tail
        try:
            aligner = aligner_factory()
            raw = aligner.align_seqs_raw(reads)
            results[tail] = raw
        finally:
            os.environ.pop("BWAMEM_TPU_NATIVE_TAIL", None)
    return results["1"], results["0"]


def _assert_equal(native, oracle):
    assert len(native) == len(oracle)
    for i, (ln, lo) in enumerate(zip(native, oracle)):
        kn = [_rec_key(a) for a, _m in ln]
        ko = [_rec_key(a) for a, _m in lo]
        assert kn == ko, f"read {i}:\n native={kn}\n oracle={ko}"


def _sim_pairs(rng, ref_codes, n, rlen=100, mean=250, std=25, err=0.01):
    reads = []
    L = len(ref_codes)
    for _ in range(n):
        isize = max(rlen + 20, min(int(rng.normal(mean, std)), L - 2))
        start = int(rng.integers(0, L - isize - 1))
        r1 = ref_codes[start : start + rlen].copy()
        r2 = (3 - ref_codes[start + isize - rlen : start + isize])[::-1].copy()
        for r in (r1, r2):
            for p in rng.integers(0, rlen, rng.binomial(rlen, err)):
                r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(BASES[r1].tobytes())
        reads.append(BASES[r2].tobytes())
    return reads


@pytest.fixture(scope="module")
def rota_img(tmp_path_factory):
    img = str(tmp_path_factory.mktemp("nt") / "rota.img")
    idx = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    image.write_image(img, idx)
    return img


@pytest.fixture(scope="module")
def rich_img(tmp_path_factory):
    """40kb 2-contig reference with a duplicated block (multimap/XA), an ALT
    contig carrying part of contig 0, and contig junctions in range of PE
    windows."""
    rng = np.random.default_rng(2024)
    c0 = rng.integers(0, 4, 30_000).astype(np.uint8)
    c0[20_000:20_400] = c0[5_000:5_400]  # exact repeat -> XA
    alt = np.concatenate(
        [c0[8_000:8_600], rng.integers(0, 4, 400).astype(np.uint8)]
    )
    alt[300] = (alt[300] + 1) % 4
    idx = build_index(
        Fasta([
            FastaContig("c0", "", c0),
            FastaContig("c1", "", rng.integers(0, 4, 6_000).astype(np.uint8)),
            FastaContig("c0_alt", "", alt),
        ])
    )
    idx.bns.anns[2].is_alt = 1
    img_dir = tmp_path_factory.mktemp("rich")
    prefix = str(img_dir / "rich")
    bwtfile.write_index_files(prefix, idx)
    img = prefix + ".img"
    from bwamem_tpu.api.index import BwaMemIndex as BMI

    BMI.create_index_image_from_index_files(prefix, img)
    full = rng.integers(0, 4, 1).astype(np.uint8)  # placate linters
    return img, c0, idx


def test_pe_rotavirus_goldens(rota_img):
    idx = BwaMemIndex(rota_img)
    try:
        L1 = b"GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
        P2 = b"TTGTTTTTAACACCAGAGTCATCCATCACATAATCAAATTTACTTTTAACTCTGGTAAATACTTCATTGT"

        def make():
            al = BwaMemAligner(idx)
            al.align_pairs()
            al.set_proper_pair_end_stats(BwaMemPairEndStats.of(200, 10, 1, 600))
            return al

        native, oracle = _run_both(make, [L1, P2])
        _assert_equal(native, oracle)
        # and the absolute golden values still hold
        a = native[0][0][0]
        assert a.flag == 0x63 and a.pos == 0
    finally:
        idx.close()


def test_pe_simulated_batch_infer_mode(rota_img):
    """Insert-size inference + rescue + pairing over a simulated batch."""
    idx = BwaMemIndex(rota_img)
    rota = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = rota.get_seq(0, rota.bns.l_pac)
    rng = np.random.default_rng(7)
    reads = _sim_pairs(rng, fwd, 60, rlen=70, mean=300, std=30)
    try:

        def make():
            al = BwaMemAligner(idx)
            al.align_pairs()
            al.infer_pair_end_stats()
            return al

        native, oracle = _run_both(make, reads)
        _assert_equal(native, oracle)
    finally:
        idx.close()


def test_pe_rich_reference_all_modes(rich_img):
    """Repeats (XA), ALT contig, contig junctions; provided + dont-infer."""
    img, c0, idx0 = rich_img
    rng = np.random.default_rng(99)
    reads = _sim_pairs(rng, c0, 50)
    # add reads from the repeat block, the ALT block, near junctions
    extra = []
    for s in (5_050, 20_050, 8_100, 29_850, 50):
        r1 = c0[s : s + 100].copy()
        r2 = (3 - c0[s + 120 : s + 220])[::-1].copy()
        extra.append(BASES[r1].tobytes())
        extra.append(BASES[r2].tobytes())
    reads = reads + extra
    idx = BwaMemIndex(img)
    try:
        for mode in ("provided", "dont_infer"):

            def make():
                al = BwaMemAligner(idx)
                al.align_pairs()
                if mode == "provided":
                    al.set_proper_pair_end_stats(BwaMemPairEndStats.of(250, 25))
                else:
                    al.dont_infer_pair_end_stats()
                return al

            native, oracle = _run_both(make, reads)
            _assert_equal(native, oracle)
    finally:
        idx.close()


def test_se_batch_with_chimeras_and_unmapped(rich_img):
    img, c0, idx0 = rich_img
    rng = np.random.default_rng(41)
    reads = []
    for _ in range(40):
        s = int(rng.integers(0, len(c0) - 120))
        r = c0[s : s + 120].copy()
        for p in rng.integers(0, 120, rng.binomial(120, 0.02)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(BASES[r].tobytes())
    # chimeric: two distant halves
    reads.append(BASES[np.concatenate([c0[100:160], c0[9000:9060]])].tobytes())
    # unmapped: random garbage
    reads.append(BASES[rng.integers(0, 4, 80)].tobytes())
    # repeat-block read (XA + mapq collapse)
    reads.append(BASES[c0[5_100:5_250]].tobytes())
    idx = BwaMemIndex(img)
    try:
        native, oracle = _run_both(lambda: BwaMemAligner(idx), reads)
        _assert_equal(native, oracle)
    finally:
        idx.close()


def test_se_fuzz_heavy_errors(rota_img):
    """High error + indel reads stress band retries, dedup, and patching."""
    idx = BwaMemIndex(rota_img)
    rota = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = rota.get_seq(0, rota.bns.l_pac)
    rng = np.random.default_rng(17)
    reads = []
    for _ in range(60):
        L = int(rng.integers(40, 200))
        s = int(rng.integers(0, len(fwd) - L))
        r = fwd[s : s + L].copy()
        for _ in range(int(rng.integers(0, 8))):
            p = int(rng.integers(0, len(r)))
            op = rng.integers(0, 3)
            if op == 0:
                r[p] = (r[p] + 1) % 4
            elif op == 1 and len(r) > 30:
                r = np.delete(r, p)
            else:
                r = np.insert(r, p, rng.integers(0, 4))
        if rng.integers(0, 2):
            r = (3 - r)[::-1].copy()  # reverse strand
        reads.append(BASES[r].tobytes())
    try:
        native, oracle = _run_both(lambda: BwaMemAligner(idx), reads)
        _assert_equal(native, oracle)
    finally:
        idx.close()


def test_long_reads_native_tail(rota_img):
    """Long/chimeric reads (the mem_flt_chained_seeds regime) through the
    native pipeline match the oracle record-for-record."""
    idx = BwaMemIndex(rota_img)
    rota = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = rota.get_seq(0, rota.bns.l_pac)
    rng = np.random.default_rng(77)
    reads = []
    # rotavirus is 1074bp; build 700-1000bp reads incl. chimeras and indels
    for _ in range(25):
        L = int(rng.integers(700, 1000))
        s = int(rng.integers(0, len(fwd) - L))
        r = fwd[s : s + L].copy()
        for p in rng.integers(0, L, rng.binomial(L, 0.02)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, len(r)))
            if rng.integers(0, 2):
                r = np.delete(r, slice(p, p + int(rng.integers(1, 8))))
            else:
                r = np.insert(r, p, rng.integers(0, 4, int(rng.integers(1, 8))))
        reads.append(BASES[np.minimum(r, 3)].tobytes())
    for _ in range(10):  # chimeric: half fwd, half revcomp of another locus
        a = fwd[0:380]
        b = (3 - fwd[600:980])[::-1]
        r = np.concatenate([a, b])
        reads.append(BASES[r].tobytes())
    try:
        native, oracle = _run_both(lambda: BwaMemAligner(idx), reads)
        _assert_equal(native, oracle)
        assert any(len(r) >= 700 for r in reads)
    finally:
        idx.close()
