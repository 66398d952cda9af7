"""Bacterial-genome-scale end-to-end accuracy (BASELINE.json config:
"paired-end 150bp reads vs E. coli K-12, insert-size inference +
proper-pair flags") — synthetic 4.6 Mbp genome, simulated PE reads with
errors and indels, placement accuracy and proper-pair rate asserted."""
import numpy as np
import pytest

from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
from bwamem_tpu.index import image
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig

GENOME_LEN = 4_600_000
N_PAIRS = 300


@pytest.fixture(scope="module")
def genome_and_index(tmp_path_factory):
    rng = np.random.default_rng(2024)
    codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    idx_obj = build_index(Fasta([FastaContig("K12", "", codes)]))
    img = str(tmp_path_factory.mktemp("ecoli") / "k12.img")
    image.write_image(img, idx_obj)
    return codes, BwaMemIndex(img)


def simulate_pairs(codes, rng, n, isize_mean=350, isize_std=35):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads, truth = [], []
    for _ in range(n):
        isize = int(np.clip(rng.normal(isize_mean, isize_std), 220, 500))
        start = int(rng.integers(0, len(codes) - isize - 1))
        r1 = codes[start : start + 150].copy()
        r2 = (3 - codes[start + isize - 150 : start + isize])[::-1].copy()
        for r in (r1, r2):
            for p in rng.integers(0, 150, rng.binomial(150, 0.01)):
                r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(bases[r1].tobytes())
        reads.append(bases[r2].tobytes())
        truth.append((start, start + isize - 150))
    return reads, truth


def test_pe_accuracy_with_inference(genome_and_index):
    codes, index = genome_and_index
    rng = np.random.default_rng(7)
    reads, truth = simulate_pairs(codes, rng, N_PAIRS)
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    aligner.infer_pair_end_stats()  # exercise mem_pestat inference
    results = aligner.align_seqs(reads)
    correct = proper = mapped = 0
    for i, (t1, t2) in enumerate(truth):
        a1 = results[2 * i][0]
        a2 = results[2 * i + 1][0]
        for a, t in ((a1, t1), (a2, t2)):
            if not (a.sam_flag & 0x4):
                mapped += 1
                if abs(a.ref_start - t) <= 5:
                    correct += 1
        if a1.sam_flag & 0x2:
            proper += 1
    n_reads = 2 * N_PAIRS
    assert mapped >= 0.99 * n_reads, f"mapped {mapped}/{n_reads}"
    assert correct >= 0.98 * n_reads, f"correct {correct}/{n_reads}"
    assert proper >= 0.95 * N_PAIRS, f"proper pairs {proper}/{N_PAIRS}"
    # mapq should be confidently high on a random (repeat-free) genome
    q = [r[0].map_qual for r in results if not (r[0].sam_flag & 0x4)]
    assert np.median(q) == 60


def test_indel_reads_at_scale(genome_and_index):
    codes, index = genome_and_index
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    aligner = BwaMemAligner(index)
    ok = 0
    reads, starts, kinds = [], [], []
    for _ in range(40):
        start = int(rng.integers(0, GENOME_LEN - 200))
        r = codes[start : start + 160].copy()
        pos = int(rng.integers(40, 120))
        ln = int(rng.integers(2, 6))
        if rng.random() < 0.5:
            r = np.concatenate([r[:pos], r[pos + ln :]])
            kinds.append("D")
        else:
            r = np.concatenate(
                [r[:pos], rng.integers(0, 4, ln).astype(np.uint8), r[pos:]]
            )
            kinds.append("I")
        reads.append(bases[r].tobytes())
        starts.append(start)
    results = aligner.align_seqs(reads)
    for recs, start, kind in zip(results, starts, kinds):
        a = recs[0]
        if not (a.sam_flag & 0x4) and a.ref_start == start and kind in a.cigar:
            ok += 1
    assert ok >= 36, f"only {ok}/40 indel reads recovered exactly"
