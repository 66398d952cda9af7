"""Batched seeding primitives on TPU.

Hot loop #1 of the reference engine is the memory-latency-bound random Occ
lookup chain of backward search (SURVEY.md section 3.3).  On TPU the same
work is a lockstep batch: every read advances one base per step, each step
is two batched occ4 gathers over the HBM-resident index — exactly the
access pattern ops/fmindex_tpu.py serves.

This module provides the device-side backward-search / forward-extension
loops (lax.while_loop lockstep with per-lane masks).  The full three-round
SMEM control flow stays host-side for now (its bookkeeping is branchy); the
device loops below cover exact-match search and the LAST-like third-round
seeding (bwt_seed_strategy1), both validated against the host oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fmindex_tpu import DeviceFMIndex, occ4_device


@partial(jax.jit, static_argnames=("primary", "seq_len"))
def backward_search_batch(
    ckpt, words, L2, qseq, qlen, primary: int, seq_len: int
):
    """Exact-match backward search for a batch of reads ([B, L] codes).

    Returns (k, l, n_matched): the final SA interval [k, l] after matching
    as many trailing bases as possible (stops per lane when empty), plus
    how many bases matched.  bwa bwt_match_exact semantics.
    """
    B, L = qseq.shape
    k0 = jnp.zeros(B, jnp.int32)
    l0 = jnp.full(B, seq_len, jnp.int32)

    def cond(state):
        i, k, l, alive, _ = state
        return (i < L) & alive.any()

    def body(state):
        i, k, l, alive, matched = state
        c = qseq[:, L - 1 - i]  # right-to-left
        valid = alive & (c < 4) & (i < qlen)
        occ_k = occ4_device(ckpt, words, L2, k - 1, primary, seq_len)
        occ_l = occ4_device(ckpt, words, L2, l, primary, seq_len)
        cc = jnp.clip(c, 0, 3)
        sel = jnp.arange(B)
        k2 = L2[cc] + occ_k[sel, cc] + 1
        l2 = L2[cc] + occ_l[sel, cc]
        ok = valid & (k2 <= l2)
        k = jnp.where(ok, k2, k)
        l = jnp.where(ok, l2, l)
        matched = jnp.where(ok, matched + 1, matched)
        alive = ok
        return i + 1, k, l, alive, matched

    _, k, l, _, matched = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), k0, l0, jnp.ones(B, bool), jnp.zeros(B, jnp.int32)),
    )
    return k, l, matched


def backward_search(dfm: DeviceFMIndex, qseq, qlen):
    return backward_search_batch(
        dfm.ckpt, dfm.words, dfm.L2, qseq, qlen, dfm.primary, dfm.seq_len
    )


@partial(jax.jit, static_argnames=("primary", "seq_len", "min_len", "max_intv"))
def seed_strategy1_batch(
    ckpt, words, L2, qseq, qlen, x, primary: int, seq_len: int,
    min_len: int, max_intv: int,
):
    """Device lockstep of [EXT] bwt_seed_strategy1 from start positions x.

    Forward-extends every read's pattern from its own x until the interval
    drops below max_intv with length > min_len.  Returns per lane
    (found, x0, x1, s, qb, qe, nxt) exactly like the host seed_strategy1 —
    nxt is the next start cursor (i+1 on hit or N, qlen at read end).
    """
    B, L = qseq.shape
    c0 = qseq[jnp.arange(B), jnp.clip(x, 0, L - 1)]
    bad0 = (c0 > 3) | (x >= qlen)
    cc0 = jnp.clip(c0, 0, 3)
    ix0 = L2[cc0] + 1
    ix1 = L2[3 - cc0] + 1
    isz = L2[cc0 + 1] - L2[cc0]

    def cond(state):
        i, alive, *_ = state
        return alive.any()

    def body(state):
        i, alive, x0, x1, s, found, fx0, fx1, fs, fqe, nxt = state
        pos = jnp.clip(x + 1 + i, 0, L - 1)
        c = qseq[jnp.arange(B), pos]
        in_range = (x + 1 + i) < qlen
        valid = alive & (c < 4) & in_range
        # next-cursor bookkeeping ([EXT] bwt_seed_strategy1 return value):
        # N at this position -> i+1; read end -> qlen
        stop_n = alive & in_range & (c >= 4)
        stop_end = alive & ~in_range
        nxt = jnp.where(stop_n, x + 2 + i, nxt)
        nxt = jnp.where(stop_end, qlen, nxt)
        # forward extension queries the revcomp coordinate (x1)
        tk = occ4_device(ckpt, words, L2, x1 - 1, primary, seq_len)
        tl = occ4_device(ckpt, words, L2, x1 - 1 + s, primary, seq_len)
        sz = tl - tk
        new_q = L2[None, :4].astype(jnp.int32) + 1 + tk
        has_sent = ((x1 <= primary) & (x1 + s - 1 >= primary)).astype(jnp.int32)
        o3 = x0 + has_sent
        o2 = o3 + sz[:, 3]
        o1 = o2 + sz[:, 2]
        o0 = o1 + sz[:, 1]
        new_o = jnp.stack([o0, o1, o2, o3], axis=1)
        ci = 3 - jnp.clip(c, 0, 3)  # bwa's ok[] index for appending base c
        sel = jnp.arange(B)
        nx0 = new_o[sel, ci]
        nx1 = new_q[sel, ci]
        ns = sz[sel, ci]
        hit = valid & (ns < max_intv) & ((x + 1 + i) - x >= min_len)
        newly = hit & ~found
        found = found | newly
        fx0 = jnp.where(newly, nx0, fx0)
        fx1 = jnp.where(newly, nx1, fx1)
        fs = jnp.where(newly, ns, fs)
        fqe = jnp.where(newly, x + i + 2, fqe)
        nxt = jnp.where(newly, x + i + 2, nxt)
        cont = valid & ~hit
        x0 = jnp.where(cont, nx0, x0)
        x1 = jnp.where(cont, nx1, x1)
        s = jnp.where(cont, ns, s)
        alive = cont
        return i + 1, alive, x0, x1, s, found, fx0, fx1, fs, fqe, nxt

    z = jnp.zeros(B, jnp.int32)
    init = (
        jnp.int32(0), ~bad0, ix0.astype(jnp.int32), ix1.astype(jnp.int32),
        isz.astype(jnp.int32), jnp.zeros(B, bool), z, z, z, z,
        (x + 1).astype(jnp.int32),
    )
    _, _, _, _, _, found, fx0, fx1, fs, fqe, nxt = jax.lax.while_loop(
        cond, body, init
    )
    return found, fx0, fx1, fs, x, fqe, nxt
