"""Device seeding loops vs the host oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.engine.seed import seed_strategy1
from bwamem_tpu.index import bwtfile
from bwamem_tpu.ops.fmindex_tpu import DeviceFMIndex
from bwamem_tpu.ops import seed_tpu


@pytest.fixture(scope="module")
def fm():
    return FMIndex(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


@pytest.fixture(scope="module")
def dfm(fm):
    return DeviceFMIndex.from_host(fm)


def _host_backward_search(fm, pat):
    k, l = 0, fm.seq_len
    n = 0
    for c in pat[::-1]:
        if c > 3:
            break
        k2 = fm.L2[c] + fm.occ(np.array([k - 1]), np.array([c]))[0] + 1
        l2 = fm.L2[c] + fm.occ(np.array([l]), np.array([c]))[0]
        if k2 > l2:
            break
        k, l = int(k2), int(l2)
        n += 1
    return k, l, n


def test_backward_search_batch(fm, dfm):
    rng = np.random.default_rng(4)
    ref = None
    from bwamem_tpu.index import bwtfile as bf

    idx = bf.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = idx.get_seq(0, idx.bns.l_pac)
    L = 32
    reads = []
    for _ in range(32):
        start = int(rng.integers(0, len(fwd) - L))
        r = fwd[start : start + L].copy()
        if rng.random() < 0.5:  # some mismatching tails
            r[int(rng.integers(0, L))] = (r[int(rng.integers(0, L))] + 1) % 4
        reads.append(r)
    qa = jnp.asarray(np.stack(reads), dtype=jnp.int32)
    qlen = jnp.full(32, L, jnp.int32)
    k, l, matched = seed_tpu.backward_search(dfm, qa, qlen)
    for i, r in enumerate(reads):
        hk, hl, hn = _host_backward_search(fm, r)
        assert (int(k[i]), int(l[i]), int(matched[i])) == (hk, hl, hn), i


def test_seed_strategy1_batch(fm, dfm):
    opt = MemOptions()
    from bwamem_tpu.index import bwtfile as bf

    idx = bf.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = idx.get_seq(0, idx.bns.l_pac)
    rng = np.random.default_rng(6)
    L = 70
    reads, xs = [], []
    for _ in range(24):
        start = int(rng.integers(0, len(fwd) - L))
        r = fwd[start : start + L].copy()
        for p in rng.integers(0, L, rng.binomial(L, 0.02)):
            r[p] = (r[p] + 1) % 4
        reads.append(r)
        xs.append(int(rng.integers(0, 20)))
    qa = jnp.asarray(np.stack(reads), dtype=jnp.int32)
    qlen = jnp.full(len(reads), L, jnp.int32)
    x = jnp.asarray(xs, dtype=jnp.int32)
    found, fx0, fx1, fs, qb, fqe, _nxt = seed_tpu.seed_strategy1(
        dfm, qa, qlen, x,
        min_len=opt.min_seed_len, max_intv=int(opt.max_mem_intv),
    )
    for i, (r, x0) in enumerate(zip(reads, xs)):
        _, m = seed_strategy1(fm, r, x0, opt.min_seed_len, opt.max_mem_intv)
        # host returns None for not-found; device found flag must agree
        if m is None:
            assert not bool(found[i]), i
        else:
            assert bool(found[i]), i
            assert (int(fx0[i]), int(fx1[i]), int(fs[i]), int(qb[i]), int(fqe[i])) == (
                m.x0, m.x1, m.s, m.qb, m.qe,
            ), i
