"""Device seed-chaining kernel vs the host oracle (ops/chain_tpu.py).

mem_chain + mem_chain_flt semantics are pinned by engine/chain.py (itself
validated against the reference's golden values); the device kernel must
reproduce them chain-for-chain, seed-for-seed — including kept codes,
weights, first-shadow indices and output order.
"""
import numpy as np
import pytest

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.chain import chain_flt, mem_chain, sample_ks
from bwamem_tpu.engine.pipeline import Engine
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.index.build import build_index
from bwamem_tpu.ops import chain_tpu
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def eng():
    rng = np.random.default_rng(7)
    c0 = rng.integers(0, 4, 30_000).astype(np.uint8)
    c1 = rng.integers(0, 4, 9_000).astype(np.uint8)
    c2 = rng.integers(0, 4, 2_000).astype(np.uint8)
    # repeat families: interspersed + tandem (drives multi-chain reads)
    unit = c0[1000:1300]
    for at in (5_000, 12_000, 21_000, 27_500):
        c0[at : at + 300] = unit
    c1[2_000:2_900] = np.tile(c0[400:500], 9)  # tandem on another contig
    ctgs = [
        FastaContig("c0", "", c0),
        FastaContig("c1", "", c1),
        FastaContig("c2_alt", "", c2),
    ]
    idx = build_index(Fasta(ctgs))
    idx.bns.anns[2].is_alt = 1
    return Engine(idx)


def _reads(eng, rng, n, read_len=120):
    bns = eng.idx.bns
    pac_fwd = []
    for a in bns.anns:
        pac_fwd.append((a.offset, a.length))
    reads = []
    for _ in range(n):
        rid = int(rng.integers(0, len(pac_fwd)))
        off, ln = pac_fwd[rid]
        L = min(read_len, ln - 1)
        start = int(rng.integers(0, ln - L))
        r = eng.idx.get_seq(off + start, off + start + L).copy()
        # mutations: SNVs, occasional N runs
        for p in rng.integers(0, L, rng.binomial(L, 0.02)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.15:
            p = int(rng.integers(0, L - 3))
            r[p : p + 3] = 4
        if rng.random() < 0.5:
            r = (3 - np.clip(r[::-1], 0, 3)).astype(np.uint8)
            r[r > 3] = 4
        reads.append(r)
    return reads


def _chain_key(c):
    return (
        c.rid, c.w, c.kept, c.first, round(c.frac_rep, 9), c.is_alt,
        tuple((s.rbeg, s.qbeg, s.len, s.score) for s in c.seeds),
    )


def _oracle_and_device(eng, opt, reads):
    fm, bns = eng.fm, eng.idx.bns
    intervals_list = [collect_intv(opt, fm, q) for q in reads]
    rbegs_list = []
    for intervals in intervals_list:
        per = []
        for p in intervals:
            ks = sample_ks(p, opt.max_occ)
            per.append(
                fm.sa_lookup(np.asarray(ks, dtype=np.int64))
                if ks
                else np.zeros(0, np.int64)
            )
        rbegs_list.append(per)
    oracle = [
        chain_flt(
            opt, mem_chain(opt, fm, bns, len(q), ivs, rbs)
        )
        for q, ivs, rbs in zip(reads, intervals_list, rbegs_list)
    ]
    dev = chain_tpu.chains_device_batch(
        opt, fm, bns, reads, intervals_list, rbegs_list
    )
    return oracle, dev


def _assert_equal(oracle, dev):
    assert len(oracle) == len(dev)
    for i, (lo, ld) in enumerate(zip(oracle, dev)):
        ko = [_chain_key(c) for c in lo]
        kd = [_chain_key(c) for c in ld]
        assert ko == kd, f"read {i}:\n oracle={ko}\n device={kd}"


def test_chain_device_fuzz(eng):
    rng = np.random.default_rng(11)
    opt = MemOptions()
    reads = _reads(eng, rng, 200)
    # pin a few reads straight from the repeat families (multi-chain certain)
    bns = eng.idx.bns
    for at in (5_050, 12_080, 21_100):
        reads.append(eng.idx.get_seq(at, at + 120).copy())
    tan = bns.anns[1].offset
    reads.append(eng.idx.get_seq(tan + 2_100, tan + 2_220).copy())
    oracle, dev = _oracle_and_device(eng, opt, reads)
    _assert_equal(oracle, dev)
    # the fixture must actually exercise multi-chain + kept<3 + ALT paths
    n_multi = sum(1 for l in oracle if len(l) > 1)
    assert n_multi >= 4
    assert any(c.kept in (1, 2) for l in oracle for c in l)
    assert any(c.is_alt for l in oracle for c in l)


def test_chain_device_low_max_occ(eng):
    """Small max_occ stresses interval sampling + frac_rep (s > max_occ)."""
    rng = np.random.default_rng(12)
    opt = MemOptions(max_occ=3, min_seed_len=15)
    reads = _reads(eng, rng, 60, read_len=90)
    oracle, dev = _oracle_and_device(eng, opt, reads)
    _assert_equal(oracle, dev)
    assert any(c.frac_rep > 0 for l in oracle for c in l)


def test_chain_device_overflow_fallback(eng, monkeypatch):
    """Reads that exceed the kernel's S/C slots must fall back exactly."""
    monkeypatch.setattr(chain_tpu, "_S_BUCKETS", (8,))
    monkeypatch.setattr(chain_tpu, "_C_BUCKETS", (2,))
    rng = np.random.default_rng(13)
    opt = MemOptions()
    reads = _reads(eng, rng, 40)
    oracle, dev = _oracle_and_device(eng, opt, reads)
    _assert_equal(oracle, dev)


def test_chain_device_short_reads(eng):
    """qlen < min_seed_len produces no chains (oracle early-out)."""
    opt = MemOptions()
    reads = [np.ones(5, np.uint8), np.zeros(19, np.uint8)]
    oracle, dev = _oracle_and_device(eng, opt, reads)
    _assert_equal(oracle, dev)


def test_device_chain_end_to_end(eng, monkeypatch):
    """Full pipeline with the whole device stage stack engaged — SMEM
    seeding, sampled-SA resolution AND chaining all on device — is
    record-equal to the host oracle path."""
    from bwamem_tpu.engine.pipeline import align_regs_batch

    rng = np.random.default_rng(21)
    opt = MemOptions()
    reads = _reads(eng, rng, 40)
    ref = align_regs_batch(opt, eng, reads, use_device_extension=False)
    monkeypatch.setenv("BWAMEM_TPU_DEVICE_SEED", "1")
    monkeypatch.setenv("BWAMEM_TPU_DEVICE_SA_LOOKUP", "1")
    monkeypatch.setenv("BWAMEM_TPU_DEVICE_CHAIN", "1")
    dev = align_regs_batch(opt, eng, reads)

    def key(r):
        return (
            r.rb, r.re, r.qb, r.qe, r.rid, r.score, r.truesc, r.sub,
            r.csub, r.sub_n, r.w, r.seedcov, r.secondary, r.frac_rep,
        )

    for i, (lr, ld) in enumerate(zip(ref, dev)):
        assert [key(r) for r in lr] == [key(r) for r in ld], f"read {i}"
