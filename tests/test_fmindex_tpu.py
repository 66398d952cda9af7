"""Device FM-index vs host oracle, plus the sharded-occ layout on a
virtual 8-device mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.index import bwtfile
from bwamem_tpu.ops import fmindex_tpu as ft


@pytest.fixture(scope="module")
def fm():
    return FMIndex(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


@pytest.fixture(scope="module")
def dfm(fm):
    return ft.DeviceFMIndex.from_host(fm)


def test_occ4_matches_host(fm, dfm):
    rng = np.random.default_rng(0)
    ks = np.concatenate(
        [
            rng.integers(-1, fm.seq_len + 1, 2000),
            np.array([-1, 0, 1, fm.primary - 1, fm.primary, fm.primary + 1,
                      fm.seq_len - 1, fm.seq_len]),
        ]
    ).astype(np.int64)
    got = np.asarray(ft.occ4(dfm, ks))
    exp = fm.occ4(ks)
    assert np.array_equal(got, exp)


def test_extend_matches_host(fm, dfm):
    rng = np.random.default_rng(1)
    n = 500
    # random valid bi-intervals from single-char inits extended a few times
    c0 = rng.integers(0, 4, n)
    x0, x1, s = fm.set_intv(c0)
    x0, x1, s = x0.copy(), x1.copy(), s.copy()
    for is_back in (False, True, False):
        ex0, ex1, esz = fm.extend(x0, x1, s, is_back)
        g = ft.extend_device(
            dfm.lines, dfm.L2,
            jnp.asarray(x0, jnp.int32), jnp.asarray(x1, jnp.int32),
            jnp.asarray(s, jnp.int32),
            primary=dfm.primary, seq_len=dfm.seq_len, span=dfm.span,
            is_back=is_back,
        )
        assert np.array_equal(np.asarray(g[0]), ex0)
        assert np.array_equal(np.asarray(g[1]), ex1)
        assert np.array_equal(np.asarray(g[2]), esz)
        # step to a random next symbol where nonempty
        c = rng.integers(0, 4, n)
        nx0 = ex0[np.arange(n), c]
        nx1 = ex1[np.arange(n), c]
        ns = esz[np.arange(n), c]
        keep = ns > 0
        x0 = np.where(keep, nx0, x0)
        x1 = np.where(keep, nx1, x1)
        s = np.where(keep, ns, s)


def test_occ4_sharded_matches(fm, dfm):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("idx",))
    lines_np = np.asarray(dfm.lines)
    nb = lines_np.shape[0]
    pad_nb = ((nb + 7) // 8) * 8
    lines_pad = np.zeros((pad_nb, lines_np.shape[1]), np.uint32)
    lines_pad[:nb] = lines_np
    blocks_per_shard = pad_nb // 8
    lines_s = jax.device_put(lines_pad, NamedSharding(mesh, P("idx", None)))
    occ4_sharded = ft.make_occ4_sharded(mesh, "idx")
    rng = np.random.default_rng(2)
    ks = rng.integers(-1, fm.seq_len + 1, 1024).astype(np.int32)
    got = np.asarray(
        occ4_sharded(
            lines_s, dfm.L2, jnp.asarray(ks), fm.primary, fm.seq_len,
            dfm.span, blocks_per_shard,
        )
    )
    exp = fm.occ4(ks.astype(np.int64))
    assert np.array_equal(got, exp)


def test_sa_lookup_device_exact():
    """Device bwt_sa walk vs the host oracle, incl. row 0 and the primary
    row (the sa[0] == -1 wrap trick)."""
    from bwamem_tpu.ops.fmindex_tpu import DeviceFMIndex, sa_lookup

    rng = np.random.default_rng(44)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    codes[1200:1500] = codes[300:600]  # repeat
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.utils.fasta import Fasta, FastaContig
    from bwamem_tpu.engine.fmindex import FMIndex

    idx = build_index(Fasta([FastaContig("c", "", codes)]))
    fm = FMIndex(idx)
    dfm = DeviceFMIndex.from_host(fm)
    ks = np.concatenate(
        [
            np.asarray([0, fm.primary, fm.seq_len - 1, 1]),
            rng.integers(0, fm.seq_len, 512),
        ]
    ).astype(np.int64)
    got = np.asarray(sa_lookup(dfm, ks.astype(np.int32)))
    exp = fm.sa_lookup(ks)
    assert np.array_equal(got, exp)


def test_int64_domain_kernels_match():
    """The int64 coordinate domain (GRCh38-scale references, bwa's 64-bit
    bwtint_t [EXT] bwt.h) forced onto a small index: every device kernel
    must agree with the host oracle exactly as the int32 domain does."""
    from bwamem_tpu.engine.fmindex import FMIndex
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.ops import seed_tpu
    from bwamem_tpu.ops.fmindex_tpu import DeviceFMIndex, sa_lookup
    from bwamem_tpu.ops.smem_tpu import smem1a_batch
    from bwamem_tpu.utils.fasta import Fasta, FastaContig

    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    codes[800:1000] = codes[100:300]  # repeats exercise wide intervals
    fm = FMIndex(build_index(Fasta([FastaContig("c", "", codes)])))
    dfm = DeviceFMIndex.from_host(fm, force_big=True)
    assert dfm.big and dfm.coord_dtype == jnp.int64

    # occ4
    ks = np.concatenate(
        [rng.integers(-1, fm.seq_len + 1, 512),
         [-1, 0, fm.primary, fm.seq_len]]
    ).astype(np.int64)
    assert np.array_equal(np.asarray(ft.occ4(dfm, ks)), fm.occ4(ks))

    # sa_lookup
    rows = rng.integers(0, fm.seq_len, 512).astype(np.int64)
    assert np.array_equal(np.asarray(sa_lookup(dfm, rows)),
                          fm.sa_lookup(rows))

    # backward search + smem + strategy-1 vs the int32-domain device twin
    dfm32 = DeviceFMIndex.from_host(fm)
    B, L = 16, 64
    reads = np.empty((B, L), np.int32)
    for i in range(B):
        s0 = int(rng.integers(0, 2000 - L))
        reads[i] = codes[s0:s0 + L]
    reads[0, 7] = 5  # an N
    qa = jnp.asarray(reads)
    qlen = jnp.full(B, L, jnp.int32)
    x = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))
    ones = jnp.ones(B, jnp.int32)
    got = seed_tpu.backward_search(dfm, qa, qlen)
    exp = seed_tpu.backward_search(dfm32, qa, qlen)
    for g, e in zip(got, exp):
        assert np.array_equal(np.asarray(g), np.asarray(e))
    got = smem1a_batch(dfm, qa, qlen, x, ones)
    exp = smem1a_batch(dfm32, qa, qlen, x, ones)
    for g, e in zip(got, exp):
        assert np.array_equal(np.asarray(g), np.asarray(e))
    got = seed_tpu.seed_strategy1(dfm, qa, qlen, x, 19, 20)
    exp = seed_tpu.seed_strategy1(dfm32, qa, qlen, x, 19, 20)
    for g, e in zip(got, exp):
        assert np.array_equal(np.asarray(g), np.asarray(e))


def test_wide_span_lines_match(fm, dfm):
    """span=256/512 fused lines must answer occ4 identically to span=128."""
    rng = np.random.default_rng(11)
    ks = np.concatenate(
        [rng.integers(-1, fm.seq_len + 1, 1024),
         [-1, 0, fm.primary, fm.seq_len]]
    ).astype(np.int64)
    exp = fm.occ4(ks)
    for span in (256, 512):
        d = ft.DeviceFMIndex.from_host(fm, span=span)
        assert np.array_equal(np.asarray(ft.occ4(d, ks)), exp), span
