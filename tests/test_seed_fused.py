"""One-dispatch fused seeding+SA (ops/seed_fused.py) vs the host oracle."""
import numpy as np
import pytest

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.chain import sample_ks
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.engine.seed_device import collect_intv_rbegs_batch_device
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(33)
    codes = rng.integers(0, 4, 60_000).astype(np.uint8)
    codes[20_000:21_000] = codes[5_000:6_000]   # repeat: wide intervals
    codes[40_000:40_300] = codes[5_000:5_300]   # 3-copy repeat (round 2)
    fm = FMIndex(build_index(Fasta([FastaContig("c", "", codes.copy())])))
    return fm, codes


def _reads(codes, rng, n, L=120):
    reads = []
    for _ in range(n):
        st = int(rng.integers(0, len(codes) - L))
        r = codes[st:st + L].copy()
        for p in rng.integers(0, L, rng.binomial(L, 0.02)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.3:
            r[int(rng.integers(0, L))] = 4  # an N
        reads.append(r)
    # one read straddling the repeat (round-2 trigger), one tiny read
    reads.append(codes[5_100:5_220].copy())
    reads.append(codes[100:140].copy())
    return reads


def test_fused_matches_oracle(fixture):
    fm, codes = fixture
    opt = MemOptions()
    rng = np.random.default_rng(34)
    reads = _reads(codes, rng, 30)
    got_intv, got_rb = collect_intv_rbegs_batch_device(opt, fm, reads)
    for i, r in enumerate(reads):
        exp = collect_intv(opt, fm, r)
        gi = got_intv[i]
        assert [(p.x0, p.x1, p.s, p.qb, p.qe) for p in gi] == [
            (p.x0, p.x1, p.s, p.qb, p.qe) for p in exp
        ], f"read {i} intervals diverge"
        for j, p in enumerate(exp):
            ks = sample_ks(p, opt.max_occ)
            exp_rb = fm.sa_lookup(np.asarray(ks, dtype=np.int64))
            assert np.array_equal(
                np.asarray(got_rb[i][j], dtype=np.int64), exp_rb
            ), f"read {i} intv {j} rbegs diverge"


def test_fused_int64_domain(fixture):
    """The same fused kernel traced in the forced int64 domain."""
    from bwamem_tpu.ops.fmindex_tpu import DeviceFMIndex

    fm, codes = fixture
    opt = MemOptions()
    rng = np.random.default_rng(35)
    reads = _reads(codes, rng, 6)
    # prime the cache with a forced-big DeviceFMIndex
    fm2 = FMIndex(build_index(Fasta([FastaContig("c", "", codes.copy())])))
    fm2._device_fms = {None: DeviceFMIndex.from_host(fm2, force_big=True)}
    got_intv, got_rb = collect_intv_rbegs_batch_device(opt, fm2, reads)
    for i, r in enumerate(reads):
        exp = collect_intv(opt, fm, r)
        assert [(p.x0, p.x1, p.s, p.qb, p.qe) for p in got_intv[i]] == [
            (p.x0, p.x1, p.s, p.qb, p.qe) for p in exp
        ], i
        for j, p in enumerate(exp):
            exp_rb = fm.sa_lookup(
                np.asarray(sample_ks(p, opt.max_occ), dtype=np.int64)
            )
            assert np.array_equal(
                np.asarray(got_rb[i][j], dtype=np.int64), exp_rb
            ), (i, j)
