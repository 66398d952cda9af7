"""One-dispatch device pipeline (ops/pipeline_fused.py) vs the host oracle.

Every region produced by the fused seed+SA+chain+extend program must be
identical — field for field, in order — to the sequential host path
(collect_intv -> mem_chain -> chain_flt -> chain2aln), and the public
align path under BWAMEM_TPU_DEVICE_PIPELINE=1 must stay record-equal.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.chain import chain_flt, mem_chain, flt_chained_seeds
from bwamem_tpu.engine.extend import chain2aln
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.pipeline import Engine
from bwamem_tpu.engine.pipeline_device import regs_batch_fused
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


def _oracle_regs(opt, eng, read):
    intervals = collect_intv(opt, eng.fm, read)
    chains = chain_flt(
        opt, mem_chain(opt, eng.fm, eng.idx.bns, len(read), intervals, None)
    )
    flt_chained_seeds(opt, eng.idx, len(read), read, chains)
    regs = []
    for c in chains:
        chain2aln(opt, eng.idx, len(read), read, c, regs)
    return regs


def _cmp(got, want, ctx=""):
    assert len(got) == len(want), (ctx, len(got), len(want))
    for g, w in zip(got, want):
        for f in (
            "rb", "re", "qb", "qe", "rid", "score", "truesc", "w",
            "seedcov", "seedlen0",
        ):
            assert getattr(g, f) == getattr(w, f), (ctx, f, g, w)
        assert abs(g.frac_rep - w.frac_rep) < 1e-9, (ctx, g, w)


@pytest.fixture(scope="module")
def engines():
    rota = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, 60_000).astype(np.uint8)
    codes[30_000:30_400] = codes[5_000:5_400]  # repeat field
    codes[45_000:45_050] = codes[5_000:5_050]
    big = build_index(
        Fasta(
            [
                FastaContig("c1", "", codes[:40_000]),
                FastaContig("c2", "", codes[40_000:]),
            ]
        )
    )
    return Engine(rota), Engine(big)


def _reads_for(rng, idx, n):
    fwd = idx.get_seq(0, idx.bns.l_pac)
    reads = []
    for _ in range(n):
        L = int(rng.integers(30, 151))
        s = int(rng.integers(0, len(fwd) - L))
        r = fwd[s : s + L].copy()
        for p in rng.integers(0, L, rng.integers(0, 5)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.integers(0, 5) == 0:  # indel-ish: splice two loci
            s2 = int(rng.integers(0, len(fwd) - L))
            cut = int(rng.integers(5, L - 5))
            r = np.concatenate([r[:cut], fwd[s2 : s2 + (L - cut)]])
        if rng.integers(0, 4) == 0:
            p = int(rng.integers(0, len(r)))
            r[p : p + int(rng.integers(1, 3))] = 4
        if rng.integers(0, 2):
            r = np.where(r < 4, 3 - r, 4)[::-1].copy()
        reads.append(r.astype(np.uint8))
    return reads


def test_fused_pipeline_matches_oracle_rotavirus(engines):
    eng, _ = engines
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = _reads_for(rng, eng.idx, 80)
    got = regs_batch_fused(opt, eng, reads)
    for i, (r, g) in enumerate(zip(reads, got)):
        _cmp(g, _oracle_regs(opt, eng, r), f"rota read {i}")


def test_fused_pipeline_matches_oracle_two_contig(engines):
    _, eng = engines
    opt = MemOptions()
    rng = np.random.default_rng(9)
    reads = _reads_for(rng, eng.idx, 120)
    got = regs_batch_fused(opt, eng, reads)
    for i, (r, g) in enumerate(zip(reads, got)):
        _cmp(g, _oracle_regs(opt, eng, r), f"2ctg read {i}")


def test_fused_pipeline_records_equal_public_surface(engines, tmp_path):
    """End-to-end through BwaMemAligner: fused pipeline == host records."""
    import os

    from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
    from bwamem_tpu.index import image
    from bwamem_tpu.utils.synth import simulate_pairs, synthetic_genome

    rng = np.random.default_rng(21)
    codes = synthetic_genome(120_000, rng)
    img = str(tmp_path / "ref.img")
    image.write_image(img, build_index(Fasta([FastaContig("c", "", codes)])))
    reads = simulate_pairs(codes, np.random.default_rng(22), 60)

    def run(env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            index = BwaMemIndex(img)
            al = BwaMemAligner(index)
            al.align_pairs()
            al.set_proper_pair_end_stats(BwaMemPairEndStats.of(350, 35))
            out = al.align_seqs(reads)
            index.close()
            return [
                [
                    (a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.map_qual,
                     a.n_mismatches, a.aligner_score, a.md_tag, a.xa_tag,
                     a.template_len)
                    for a in rl
                ]
                for rl in out
            ]
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    host = run({"BWAMEM_TPU_DEVICE_PIPELINE": "0"})
    dev = run({"BWAMEM_TPU_DEVICE_PIPELINE": "1"})
    assert host == dev
