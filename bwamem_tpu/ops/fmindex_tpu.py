"""Device-resident FM-index: batched Occ rank queries on TPU.

TPU-native replacement for the reference's hot loop #1 — the memory-bound
random Occ() lookups of [EXT] bwt.c's backward search (SURVEY.md 3.3).  The
checkpointed BWT lives in HBM as two flat arrays (counts + packed words);
a batch of N rank queries becomes two gathers plus SWAR popcounts on the
VPU — no scalar loops.

int32 domain: positions/counts fit int32 for references up to ~1 Gbp
(seq_len = 2*l_pac < 2^31), which covers every per-chip shard we target;
whole-genome/pangenome scale shards the occ table across devices
(occ4_sharded) so each shard stays in the int32 domain.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.fmindex import FMIndex


@dataclass(frozen=True)
class DeviceFMIndex:
    """FM-index arrays on device + static scalars."""

    ckpt: jax.Array  # [nb+1, 4] int32 counts before each 128-char block
    words: jax.Array  # [nb, 8] uint32, 16 chars per word, MSB-first
    L2: jax.Array  # [5] int32
    sa: jax.Array  # [n_sa] int32 sampled suffix array (sa[0] == -1)
    primary: int
    seq_len: int
    sa_intv: int

    @classmethod
    def from_host(cls, fm: FMIndex) -> "DeviceFMIndex":
        if fm.seq_len >= (1 << 31):
            raise ValueError(
                "reference too large for the int32 device domain; shard the "
                "occ table across devices (parallel/) instead"
            )
        return cls(
            ckpt=jnp.asarray(fm.ckpt.astype(np.int32)),
            words=jnp.asarray(fm.words.astype(np.uint32)),
            L2=jnp.asarray(fm.L2.astype(np.int32)),
            sa=jnp.asarray(fm.sa.astype(np.int32)),
            primary=int(fm.primary),
            seq_len=int(fm.seq_len),
            sa_intv=int(fm.sa_intv),
        )


_M55 = jnp.uint32(0x55555555)
_M33 = jnp.uint32(0x33333333)
_M0F = jnp.uint32(0x0F0F0F0F)


def _popcount32(x):
    x = x - ((x >> jnp.uint32(1)) & _M55)
    x = (x & _M33) + ((x >> jnp.uint32(2)) & _M33)
    x = (x + (x >> jnp.uint32(4))) & _M0F
    return (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)


def _block_counts4(words, nchars):
    """Counts of all 4 symbols among the first nchars chars of each block.

    words: [N, 8] uint32; nchars: [N] int32 in [0, 128].  Returns [N, 4].
    The four symbol counts come from two bit-planes: for char code c =
    2*hi + lo, count via popcount of plane masks.
    """
    n = words.shape[0]
    word_base = (jnp.arange(8, dtype=jnp.int32) * 16)[None, :]
    valid = jnp.clip(nchars[:, None] - word_base, 0, 16).astype(jnp.uint32)  # [N,8]
    shift = jnp.uint32(32) - jnp.uint32(2) * valid
    full = jnp.uint32(0xFFFFFFFF)
    keep = jnp.where(
        valid == 0,
        jnp.uint32(0),
        (full << jnp.minimum(shift, jnp.uint32(31))).astype(jnp.uint32),
    )
    keep = jnp.where(valid == 16, full, keep)
    # char j occupies bits {31-2j (hi), 30-2j (lo)}; align planes to the low
    # bit of each pair so masks line up with `keep`'s per-char bit at 30-2j
    hi = (words >> jnp.uint32(1)) & _M55  # hi bit at position 30-2j
    lo = words & _M55
    out = []
    for c in range(4):
        hi_m = hi if (c >> 1) else (~hi & _M55)
        lo_m = lo if (c & 1) else (~lo & _M55)
        sel = hi_m & lo_m & (keep & _M55)
        out.append(jnp.sum(_popcount32(sel), axis=1).astype(jnp.int32))
    return jnp.stack(out, axis=1)  # [N, 4]


@partial(jax.jit, static_argnames=("primary", "seq_len"))
def occ4_device(ckpt, words, L2, k, primary: int, seq_len: int):
    """bwa bwt_occ4 semantics for a batch of conceptual positions k [N].

    Counts of each symbol among conceptual BWT chars [0..k] inclusive;
    k == -1 -> 0, k == seq_len -> full counts.
    """
    k = k.astype(jnp.int32)
    is_all = k == seq_len
    is_none = k == -1
    kk = k - (k >= primary).astype(jnp.int32)
    kk = jnp.clip(kk, 0, None)
    block = kk >> 7
    within = (kk & 127) + 1
    base = ckpt[block]  # [N, 4] gather
    w = words[block]  # [N, 8] gather
    cnt = base + _block_counts4(w, within)
    full = (L2[1:5] - L2[0:4])[None, :].astype(jnp.int32)
    cnt = jnp.where(is_all[:, None], full, cnt)
    cnt = jnp.where(is_none[:, None], 0, cnt)
    return cnt


def occ4(dfm: DeviceFMIndex, k) -> jax.Array:
    return occ4_device(
        dfm.ckpt, dfm.words, dfm.L2, jnp.asarray(k), dfm.primary, dfm.seq_len
    )


@partial(jax.jit, static_argnames=("primary", "seq_len", "is_back"))
def extend_device(ckpt, words, L2, x0, x1, s, primary: int, seq_len: int, is_back: bool):
    """Batched bidirectional bwt_extend; mirrors FMIndex.extend exactly.

    Returns (ox0, ox1, sz) of shape [N, 4], indexed by queried-space symbol
    (bwa ok[] convention — see engine/fmindex.py docstring).
    """
    xq = x0 if is_back else x1
    xo = x1 if is_back else x0
    tk = occ4_device(ckpt, words, L2, xq - 1, primary, seq_len)
    tl = occ4_device(ckpt, words, L2, xq - 1 + s, primary, seq_len)
    new_q = L2[None, :4].astype(jnp.int32) + 1 + tk
    sz = tl - tk
    has_sent = ((xq <= primary) & (xq + s - 1 >= primary)).astype(jnp.int32)
    o3 = xo + has_sent
    o2 = o3 + sz[:, 3]
    o1 = o2 + sz[:, 2]
    o0 = o1 + sz[:, 1]
    new_o = jnp.stack([o0, o1, o2, o3], axis=1)
    if is_back:
        return new_q, new_o, sz
    return new_o, new_q, sz


def make_occ4_sharded(mesh, axis: str):
    """Occ4 with the checkpoint/word tables sharded across `axis`.

    Each device holds a contiguous slice of blocks; queries are replicated,
    each shard answers the ones whose block it owns, and a psum merges.
    This is the pangenome-scale layout from SURVEY.md section 5 (sharded occ
    tables; collectives ride ICI).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def _sharded(ckpt, words, L2, k, primary, seq_len, blocks_per_shard):
        def body(ckpt_s, words_s, L2_f, k_f):
            shard = jax.lax.axis_index(axis)
            lo = shard * blocks_per_shard
            kk = k_f - (k_f >= primary).astype(jnp.int32)
            kk = jnp.clip(kk, 0, None)
            block = kk >> 7
            mine = (block >= lo) & (block < lo + ckpt_s.shape[0])
            local_block = jnp.clip(block - lo, 0, ckpt_s.shape[0] - 1)
            within = (kk & 127) + 1
            base = ckpt_s[local_block]
            w = jnp.where(
                mine[:, None], words_s[jnp.clip(local_block, 0, words_s.shape[0] - 1)], 0
            )
            cnt = base + _block_counts4(w, within)
            cnt = jnp.where(mine[:, None], cnt, 0)
            cnt = jax.lax.psum(cnt, axis)
            full = (L2_f[1:5] - L2_f[0:4])[None, :].astype(jnp.int32)
            cnt = jnp.where((k_f == seq_len)[:, None], full, cnt)
            cnt = jnp.where((k_f == -1)[:, None], 0, cnt)
            return cnt

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(), P()),
            out_specs=P(),
        )(ckpt, words, L2, k)

    return _sharded


@partial(jax.jit, static_argnames=("primary", "seq_len", "sa_intv"))
def sa_lookup_kernel(
    ckpt, words, L2, sa, k, primary: int, seq_len: int, sa_intv: int
):
    """Sampled-SA resolution for a batch of conceptual rows ([EXT] bwt_sa).

    Each row walks k -> LF(k) until it hits a sampled row; the walks run in
    lockstep (one occ4 gather batch per tick), so the batch costs
    max-steps ticks instead of sum-of-steps serial chases — the device
    analog of the native lane-interleaved walker (fmindex.cpp
    bwamem_sa_batch).  sa[0] == -1 is load-bearing exactly as in the host
    oracle (engine/fmindex.py:247-251).
    """
    k = k.astype(jnp.int32)
    lane = jnp.arange(k.shape[0])
    steps = jnp.zeros_like(k)

    def cond(st):
        k, _ = st
        return ((k % sa_intv) != 0).any()

    def body(st):
        k, steps = st
        act = (k % sa_intv) != 0
        at_p = k == primary
        kk = jnp.clip(k - (k > primary).astype(jnp.int32), 0, None)
        block = kk >> 7
        within = kk & 127
        word = words[block, within >> 4]
        shift = (jnp.uint32(30) - jnp.uint32(2) * (within & 15).astype(jnp.uint32))
        c = ((word >> shift) & jnp.uint32(3)).astype(jnp.int32)
        cnt = occ4_device(ckpt, words, L2, k, primary, seq_len)
        nk = L2[c].astype(jnp.int32) + cnt[lane, c]
        nk = jnp.where(at_p, 0, nk)
        k = jnp.where(act, nk, k)
        steps = steps + act.astype(jnp.int32)
        return k, steps

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return sa[k // sa_intv] + steps


def sa_lookup(dfm: DeviceFMIndex, k) -> jax.Array:
    """Device bwt_sa over a batch of rows; exact vs FMIndex.sa_lookup."""
    return sa_lookup_kernel(
        dfm.ckpt, dfm.words, dfm.L2, dfm.sa, jnp.asarray(k),
        dfm.primary, dfm.seq_len, dfm.sa_intv,
    )
