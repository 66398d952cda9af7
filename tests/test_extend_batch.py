"""Wave-batched chain extension must match the per-read path exactly."""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.pipeline import Engine, align1_regs, align_regs_batch
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import revcomp_codes


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def _reads(eng, rng, n, rlen=100, err=0.04, indels=True):
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    reads = []
    for _ in range(n):
        start = int(rng.integers(0, len(fwd) - rlen - 6))
        r = fwd[start : start + rlen].copy()
        for p in rng.integers(0, rlen, rng.binomial(rlen, err)):
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if indels and rng.random() < 0.4:
            pos = int(rng.integers(5, rlen - 8))
            ln = int(rng.integers(1, 4))
            if rng.random() < 0.5:  # deletion from read
                r = np.concatenate([r[:pos], r[pos + ln :]])
            else:  # insertion
                ins = rng.integers(0, 4, ln).astype(np.uint8)
                r = np.concatenate([r[:pos], ins, r[pos:]])
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        reads.append(r)
    return reads


def test_wave_batched_regs_match(eng):
    opt = MemOptions()
    rng = np.random.default_rng(23)
    reads = _reads(eng, rng, 30)
    got_all = align_regs_batch(opt, eng, reads, use_device_extension=True)
    for q, got in zip(reads, got_all):
        exp = align1_regs(opt, eng, q)
        assert len(got) == len(exp), (len(got), len(exp))
        for a, b in zip(got, exp):
            assert (
                a.rb, a.re, a.qb, a.qe, a.score, a.truesc, a.w, a.seedcov,
                a.seedlen0, a.rid,
            ) == (
                b.rb, b.re, b.qb, b.qe, b.score, b.truesc, b.w, b.seedcov,
                b.seedlen0, b.rid,
            )


def test_wide_kernel_dispatch_matches_oracle():
    """qlen >= 2048 dispatches the AVX2 wide kernel (ksw.cpp
    ksw_extend_one_wide) — pin it to the python ksw_extend2 oracle on the
    long-read regime it serves (band-wide rows, zdrop on/off, indels)."""
    from bwamem_tpu.engine import native_ksw
    from bwamem_tpu.engine.extend import ksw_extend2

    if not native_ksw.available():
        import pytest

        pytest.skip("no C++ toolchain")
    opt = MemOptions()
    rng = np.random.default_rng(321)
    jobs, h0s, ws, bonuses = [], [], [], []
    for trial in range(6):
        qlen = int(rng.integers(2048, 4000))
        tlen = qlen + int(rng.integers(0, 500))
        tseq = rng.integers(0, 4, tlen).astype(np.uint8)
        qseq = tseq[:qlen].copy()
        for p in rng.integers(0, qlen, rng.binomial(qlen, 0.06)):
            qseq[p] = (qseq[p] + 1 + rng.integers(0, 3)) % 4
        if trial % 2:  # a deletion to force off-diagonal bands
            cut = int(rng.integers(100, 300))
            qseq = np.concatenate([qseq[: qlen // 2], qseq[qlen // 2 + cut :]])
        jobs.append((qseq, tseq))
        h0s.append(int(rng.integers(20, 60)))
        ws.append(int(rng.integers(50, 150)))
        bonuses.append(int(rng.integers(0, 8)))
    for zdrop in (0, 100):
        got = native_ksw.extend_batch(
            jobs, opt.mat, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            zdrop, h0s, ws, bonuses,
        )
        for (qseq, tseq), h0, w, bonus, d in zip(jobs, h0s, ws, bonuses, got):
            r = ksw_extend2(
                qseq, tseq, opt.mat, opt.o_del, opt.e_del, opt.o_ins,
                opt.e_ins, w, bonus, zdrop, h0,
            )
            assert (
                d["score"], d["qle"], d["tle"], d["gtle"], d["gscore"],
                d["max_off"],
            ) == (r.score, r.qle, r.tle, r.gtle, r.gscore, r.max_off)
