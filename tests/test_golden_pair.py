"""Engine-level paired-end tests beyond the API goldens: pestat inference,
mate rescue, and the pairing score model ([EXT] bwamem_pair.c semantics).
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions, MEM_F_PE
from bwamem_tpu.engine import pair as P
from bwamem_tpu.engine.pipeline import Engine, align1_regs
from bwamem_tpu.index import bwtfile
from bwamem_tpu.utils.encoding import revcomp_codes, seq_to_codes


@pytest.fixture(scope="module")
def eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


def make_pairs(eng, rng, n, isize_mean=200, isize_std=10, rlen=70):
    """Simulate proper FR pairs from the rotavirus reference."""
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    pairs = []
    for _ in range(n):
        isize = int(rng.normal(isize_mean, isize_std))
        start = int(rng.integers(0, len(fwd) - isize - 1))
        r1 = fwd[start : start + rlen].copy()
        r2 = revcomp_codes(fwd[start + isize - rlen : start + isize])
        pairs.append((r1, r2))
    return pairs


def test_pestat_inference(eng):
    """mem_pestat finds the FR orientation with enough proper pairs."""
    opt = MemOptions(flag=MEM_F_PE)
    rng = np.random.default_rng(42)
    pairs = make_pairs(eng, rng, 32)
    regs = []
    for r1, r2 in pairs:
        regs.append(align1_regs(opt, eng, r1))
        regs.append(align1_regs(opt, eng, r2))
    pes = P.pestat(opt, eng.idx.bns.l_pac, regs)
    assert pes[1].failed == 0  # FR inferred
    assert pes[0].failed and pes[2].failed and pes[3].failed
    assert 150 < pes[1].avg < 250
    assert pes[1].low >= 1
    assert pes[1].high > pes[1].avg


def test_infer_dir(eng):
    l_pac = eng.idx.bns.l_pac
    # FR: read1 fwd at 0, read2 rev at (2*l_pac-1-209)
    d, dist = P.infer_dir(l_pac, 0, 2 * l_pac - 1 - 209)
    assert (d, dist) == (1, 209)
    # RF (outie)
    d, _ = P.infer_dir(l_pac, 2 * l_pac - 1 - 100, 300)
    assert d == 2
    # FF
    d, dist = P.infer_dir(l_pac, 10, 200)
    assert (d, dist) == (0, 190)


def test_mate_rescue(eng):
    """A mate with no seeds (too many mismatches spread out) is rescued by
    windowed SW around its anchor."""
    opt = MemOptions(flag=MEM_F_PE)
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    r1 = fwd[0:70].copy()
    # mate: reverse complement of [140,210) with mismatches every 12bp so no
    # 19bp exact seed survives
    m = fwd[140:210].copy()
    for pos in range(5, 70, 12):
        m[pos] = (m[pos] + 1) % 4
    r2 = revcomp_codes(m)
    regs1 = align1_regs(opt, eng, r1)
    regs2 = align1_regs(opt, eng, r2)
    assert regs1 and not regs2  # mate unseedable
    pes = P.default_pes()
    pes[1] = P.PeStat(low=1, high=600, failed=0, avg=200.0, std=10.0)
    n = P.matesw(opt, eng, pes, regs1[0], r2, regs2)
    assert n > 0
    assert regs2, "mate was not rescued"
    b = regs2[0]
    assert b.rb >= eng.idx.bns.l_pac  # reverse strand
    fpos, is_rev = eng.idx.bns.depos(b.re - 1)
    assert is_rev and abs(fpos - 140) <= 2


def test_sw_local_matches_bruteforce(eng):
    """sw_local vs an O(n*m) reference DP on random sequences."""
    rng = np.random.default_rng(3)
    mat = MemOptions().mat
    m5 = np.asarray(mat).reshape(5, 5)
    for _ in range(20):
        q = rng.integers(0, 4, 30).astype(np.uint8)
        t = rng.integers(0, 4, 50).astype(np.uint8)
        hit = P.sw_local(q, t, mat, 6, 1, 6, 1, 0)
        # brute force H
        H = np.zeros((len(t) + 1, len(q) + 1), dtype=int)
        E = np.zeros_like(H)
        F = np.zeros_like(H)
        best = 0
        for i in range(1, len(t) + 1):
            for j in range(1, len(q) + 1):
                E[i][j] = max(E[i - 1][j] - 1, H[i - 1][j] - 7, 0)
                F[i][j] = max(F[i][j - 1] - 1, H[i][j - 1] - 7, 0)
                H[i][j] = max(
                    0,
                    H[i - 1][j - 1] + m5[t[i - 1], q[j - 1]],
                    E[i][j],
                    F[i][j],
                )
                best = max(best, H[i][j])
        assert hit.score == best
        if best > 0:
            # reported end cell must achieve the max
            assert H[hit.te + 1][hit.qe + 1] == best


def test_pair_prefers_paired_when_scores_allow(eng):
    opt = MemOptions(flag=MEM_F_PE)
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    r1 = fwd[0:70].copy()
    r2 = revcomp_codes(fwd[140:210])
    regs = [align1_regs(opt, eng, r1), align1_regs(opt, eng, r2)]
    pes = P.default_pes()
    pes[1] = P.PeStat(low=1, high=600, failed=0, avg=200.0, std=10.0)
    out0, out1 = P.sam_pe(opt, eng, pes, 0, (r1, r2), regs)
    assert out0[0].flag & 0x2  # proper pair
    assert out1[0].flag & 0x2
    assert out0[0].flag & 0x40 and out1[0].flag & 0x80
