"""End-to-end alignment benchmark (driver contract: ONE JSON line).

Measures reads/s through the public aligner surface on a synthetic
bacterial-scale reference with 150bp paired-end reads — the shape of
BASELINE.json's "paired-end 150bp vs E. coli K-12" config, sized to finish
fast.  The TPU chip accelerates the extension/occ device kernels as the
pipeline adopts them; this number is the honest full-pipeline throughput
(host orchestration included), not a kernel-only figure.

vs_baseline: ratio against a single bwa-mem CPU thread's typical ~5k
reads/s on 150bp PE (no number is published in the reference repo —
BASELINE.md documents the absence; 5k/thread is the accepted ballpark for
bwa-mem 0.7.x on modern cores).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_SEC = 5000.0  # one bwa-mem thread, 150bp PE (ballpark)


def main():
    from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.index import image
    from bwamem_tpu.utils.fasta import Fasta, FastaContig

    rng = np.random.default_rng(1234)
    ref_len = 500_000
    codes = rng.integers(0, 4, ref_len).astype(np.uint8)
    fa = Fasta([FastaContig("chr", "", codes)])
    idx_obj = build_index(fa)
    img = "/tmp/bench_ref.img"
    image.write_image(img, idx_obj)

    index = BwaMemIndex(img)
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(350, 35))

    # simulate proper FR pairs with 0.5% errors
    def simulate(n):
        reads = []
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        for _ in range(n):
            isize = int(rng.normal(350, 35))
            isize = max(200, min(isize, 500))
            start = int(rng.integers(0, ref_len - isize - 1))
            r1 = codes[start : start + 150].copy()
            r2 = codes[start + isize - 150 : start + isize].copy()
            r2 = (3 - r2)[::-1].copy()
            for r in (r1, r2):
                nerr = rng.binomial(150, 0.005)
                for p in rng.integers(0, 150, nerr):
                    r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
            reads.append(bases[r1].tobytes())
            reads.append(bases[r2].tobytes())
        return reads

    warm = simulate(8)
    aligner.align_seqs(warm)  # warm caches/compiles

    n_pairs = int(os.environ.get("BENCH_PAIRS", "6000"))
    reads = simulate(n_pairs)
    n_reads = len(reads)
    rate = 0.0
    results = None
    for _ in range(2):  # steady state: best of two
        t0 = time.time()
        results = aligner.align_seqs(reads)
        dt = time.time() - t0
        rate = max(rate, n_reads / dt)
    aligned = sum(1 for r in results if r and not (r[0].sam_flag & 0x4))
    index.close()
    assert aligned >= 0.95 * n_reads, f"only {aligned}/{n_reads} aligned"
    print(
        json.dumps(
            {
                "metric": "reads_per_sec_chip_150bp_pe",
                "value": round(rate, 2),
                "unit": "reads/s",
                "vs_baseline": round(rate / BASELINE_READS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
