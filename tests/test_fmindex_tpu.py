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
            dfm.ckpt, dfm.words, dfm.L2,
            jnp.asarray(x0, jnp.int32), jnp.asarray(x1, jnp.int32),
            jnp.asarray(s, jnp.int32),
            primary=dfm.primary, seq_len=dfm.seq_len, is_back=is_back,
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
    nb = fm.n_blocks
    pad_nb = ((nb + 7) // 8) * 8
    ckpt = np.zeros((pad_nb, 4), np.int32)
    ckpt[:nb] = fm.ckpt[:nb].astype(np.int32)
    words = np.zeros((pad_nb, 8), np.uint32)
    words[:nb] = fm.words.astype(np.uint32)
    blocks_per_shard = pad_nb // 8
    ckpt_s = jax.device_put(ckpt, NamedSharding(mesh, P("idx", None)))
    words_s = jax.device_put(words, NamedSharding(mesh, P("idx", None)))
    occ4_sharded = ft.make_occ4_sharded(mesh, "idx")
    rng = np.random.default_rng(2)
    ks = rng.integers(-1, fm.seq_len + 1, 1024).astype(np.int32)
    got = np.asarray(
        occ4_sharded(
            ckpt_s, words_s, dfm.L2, jnp.asarray(ks), fm.primary, fm.seq_len,
            blocks_per_shard,
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
