"""Native C++ engine stages vs the python oracles (regression guards)."""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine import native_chain, native_core, native_fm, native_ksw
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_regs_batch
from bwamem_tpu.engine.seed import collect_intv
from bwamem_tpu.index import bwtfile
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.encoding import revcomp_codes
from bwamem_tpu.utils.fasta import Fasta, FastaContig

pytestmark = pytest.mark.skipif(
    not native_fm.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def eng():
    rng = np.random.default_rng(77)
    codes = rng.integers(0, 4, 80_000).astype(np.uint8)
    codes[40_000:40_250] = codes[8_000:8_250]  # a repeat
    return Engine(build_index(Fasta([FastaContig("g", "", codes)])))


def _messy_reads(eng, rng, n):
    ref = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    for _ in range(n):
        rlen = int(rng.integers(40, 280))
        start = int(rng.integers(0, len(ref) - rlen - 10))
        r = ref[start : start + rlen].copy()
        for p in rng.integers(0, rlen, rng.binomial(rlen, 0.03)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.3:
            pos = int(rng.integers(10, rlen - 10))
            ln = int(rng.integers(1, 5))
            if rng.random() < 0.5:
                r = np.concatenate([r[:pos], r[pos + ln :]])
            else:
                r = np.concatenate(
                    [r[:pos], rng.integers(0, 4, ln).astype(np.uint8), r[pos:]]
                )
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        if rng.random() < 0.1:
            r[int(rng.integers(0, len(r)))] = 4
        reads.append(r)
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))  # unalignable
    return reads


def test_native_seeding_matches_python(eng):
    opt = MemOptions()
    rng = np.random.default_rng(1)
    reads = _messy_reads(eng, rng, 30)
    got = native_fm.collect_intv_batch(opt, eng.fm, reads)
    for q, g in zip(reads, got):
        e = collect_intv(opt, eng.fm, q)
        assert len(g) == len(e)
        for a, b in zip(g, e):
            assert (a.x0, a.x1, a.s, a.qb, a.qe) == (b.x0, b.x1, b.s, b.qb, b.qe)


def test_native_sa_matches_python(eng):
    rng = np.random.default_rng(2)
    ks = rng.integers(1, eng.fm.seq_len + 1, 5000).astype(np.int64)
    assert np.array_equal(native_fm.sa_batch(eng.fm, ks), eng.fm.sa_lookup(ks))


def test_fused_core_end_to_end_matches_oracle(eng):
    opt = MemOptions()
    rng = np.random.default_rng(3)
    reads = _messy_reads(eng, rng, 25)
    assert native_core.available() and native_chain.available()
    got_all = align_regs_batch(opt, eng, reads)  # fused native path
    for q, got in zip(reads, got_all):
        exp = align1_regs(opt, eng, q)  # pure python oracle
        assert len(got) == len(exp)
        for a, b in zip(got, exp):
            assert (
                a.rb, a.re, a.qb, a.qe, a.rid, a.score, a.truesc, a.w,
                a.seedcov, a.seedlen0,
            ) == (
                b.rb, b.re, b.qb, b.qe, b.rid, b.score, b.truesc, b.w,
                b.seedcov, b.seedlen0,
            )


def test_native_ksw_matches_oracle_quick():
    from bwamem_tpu.engine.extend import ksw_extend2

    opt = MemOptions()
    rng = np.random.default_rng(4)
    jobs, h0s, ws, bs = [], [], [], []
    for _ in range(50):
        ql = int(rng.integers(1, 120))
        tl = int(rng.integers(1, 200))
        base = rng.integers(0, 4, max(ql, tl)).astype(np.uint8)
        q, t = base[:ql].copy(), base[:tl].copy()
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(t)))
            t[p] = (t[p] + 1) % 4
        jobs.append((q, t))
        h0s.append(int(rng.integers(1, 60)))
        ws.append(int(rng.choice([3, 100])))
        bs.append(int(rng.choice([0, 5])))
    got = native_ksw.extend_batch(
        jobs, opt.mat, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        opt.zdrop, h0s, ws, bs,
    )
    for (q, t), h0, w, b, g in zip(jobs, h0s, ws, bs, got):
        e = ksw_extend2(q, t, opt.mat, opt.o_del, opt.e_del, opt.o_ins,
                        opt.e_ins, w, b, opt.zdrop, h0)
        assert g == dict(score=e.score, qle=e.qle, tle=e.tle, gtle=e.gtle,
                         gscore=e.gscore, max_off=e.max_off)
