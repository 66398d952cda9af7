"""Gigabase-regime coverage.

The full 1.05 Gbp run lives in benchmarks/gbp_bench.py (artifact:
BENCH_GBP_r{N}.json).  Here:

  * the packed-reference regime (no unpacked cache — what a >RAM/8
    reference falls back to) is pinned record-for-record against the
    cached fast path on a small reference, and
  * an env-gated midsize (320 Mbp) end-to-end build+align runs the same
    code path the gigabase artifact uses (BWAMEM_TPU_SLOW_TESTS=1).

Reference anchor: the engine must behave identically regardless of how
reference bytes are fetched ([EXT] bns_get_seq reads the 2-bit pac
directly; the unpacked cache is this repo's optimization only).
"""
import os

import numpy as np
import pytest

from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
from bwamem_tpu.index import image
from bwamem_tpu.index.build import BwaIndex, build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig
from bwamem_tpu.utils.synth import simulate_pairs, synthetic_genome


def _records(img_path, reads):
    index = BwaMemIndex(img_path)
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(350, 35))
    out = aligner.align_seqs(reads)
    index.close()
    return [
        [
            (
                a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.map_qual,
                a.n_mismatches, a.aligner_score, a.md_tag, a.xa_tag,
                a.mate_ref_start, a.template_len,
            )
            for a in recs
        ]
        for recs in out
    ]


def test_packed_reference_regime_matches_cached(tmp_path, monkeypatch):
    """No-unpacked-cache alignment (the >RAM/8 fallback) is record-equal."""
    rng = np.random.default_rng(17)
    codes = synthetic_genome(300_000, rng)
    idx = build_index(Fasta([FastaContig("c", "", codes)]))
    img = str(tmp_path / "ref.img")
    image.write_image(img, idx)
    reads = simulate_pairs(codes, np.random.default_rng(18), 150)

    cached = _records(img, reads)
    monkeypatch.setattr(BwaIndex, "_UNPACK_CACHE_MAX", 0)
    packed = _records(img, reads)
    assert packed == cached


@pytest.mark.skipif(
    os.environ.get("BWAMEM_TPU_SLOW_TESTS") != "1",
    reason="midsize scale run (minutes); set BWAMEM_TPU_SLOW_TESTS=1",
)
def test_midsize_320mbp_end_to_end(tmp_path):
    rng = np.random.default_rng(23)
    codes = synthetic_genome(320_000_000, rng)
    idx = build_index(Fasta([FastaContig("c", "", codes)]))
    img = str(tmp_path / "ref.img")
    image.write_image(img, idx)
    del idx
    reads, truth = simulate_pairs(
        codes, np.random.default_rng(24), 500, return_truth=True
    )
    index = BwaMemIndex(img)
    aligner = BwaMemAligner(index)
    aligner.align_pairs()
    aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(350, 35))
    results = aligner.align_seqs(reads)
    index.close()
    mapped = sum(1 for r in results if r and not (r[0].sam_flag & 0x4))
    good = sum(
        1
        for recs, (pos, _rev) in zip(results, truth)
        if recs
        and not (recs[0].sam_flag & 0x4)
        and abs(recs[0].ref_start - pos) <= 160
    )
    assert mapped >= 0.95 * len(reads)
    assert good >= 0.90 * len(reads)


@pytest.mark.skipif(
    os.environ.get("BWAMEM_TPU_SLOW_TESTS") != "1",
    reason="gigabase-scale synthetic index (minutes); BWAMEM_TPU_SLOW_TESTS=1",
)
def test_big_domain_fused_device_seed_1p55gbp():
    """>2^31 seq_len (1.55 Gbp reference scale): the FUSED one-dispatch
    device seeding+SA runs in the int64 coordinate domain and is
    record-equal to the host oracle (intervals AND rbegs).  Uses the
    structurally-consistent random-BWT index (utils/synth.py) so the test
    costs seconds of setup, not a gigabase SA-IS build."""
    import numpy as np

    from bwamem_tpu.api.options import MemOptions
    from bwamem_tpu.engine.chain import sample_ks
    from bwamem_tpu.engine.seed import collect_intv
    from bwamem_tpu.engine.seed_device import collect_intv_rbegs_batch_device
    from bwamem_tpu.utils.synth import synthetic_fmindex

    opt = MemOptions(min_seed_len=14)  # see __graft_entry__ big section
    rng = np.random.default_rng(77)
    fm = synthetic_fmindex((3_100_000_000 // 128) * 128, rng, sa_intv=512)
    reads = [rng.integers(0, 4, 80).astype(np.uint8) for _ in range(12)]
    reads.append(np.full(30, 4, dtype=np.uint8))
    got_i, got_rb = collect_intv_rbegs_batch_device(opt, fm, reads)
    for i, r in enumerate(reads):
        exp = collect_intv(opt, fm, r)
        assert [(p.x0, p.x1, p.s, p.qb, p.qe) for p in got_i[i]] == [
            (p.x0, p.x1, p.s, p.qb, p.qe) for p in exp
        ], i
        for j, p in enumerate(exp):
            exp_rb = fm.sa_lookup(
                np.asarray(sample_ks(p, opt.max_occ), dtype=np.int64)
            )
            assert np.array_equal(
                np.asarray(got_rb[i][j], dtype=np.int64), exp_rb
            ), (i, j)
