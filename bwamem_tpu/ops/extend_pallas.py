"""Pallas TPU kernel for batched banded-SW extension.

Same exact semantics as ops/extend_tpu.ksw_extend_batch (itself bit-exact
with [EXT] ksw_extend2 via the host oracle), but the whole DP runs inside
one Pallas kernel with the row state resident in VMEM for all T rows — no
HBM round-trips between rows, which is what bounds the XLA-scan
formulation.

v3 layout: TRANSPOSED — query columns on SUBLANES, jobs on LANES ([Q, B]
arrays).  Chosen from measured Mosaic op costs on the v5e (relay-free
microprobes, benchmarks/mosaic_probe.py):

  * a cross-LANE max reduction costs ~1.44 us while the same reduction
    across SUBLANES costs ~0.11 us (13x) — and this kernel needs three row
    reductions per target row (packed max+argmax, last-column H, window
    shrink bounds);
  * pltpu.roll along sublanes is ~2.5x cheaper than along lanes (the
    horizontal-gap prefix-max is log2(Q) roll+max steps);
  * per-job bookkeeping ([1, B] row vectors: band bounds, zdrop margins,
    running maxima) costs ~27 ns/op vs ~14 ns for a [B, 1] column in the
    old layout TIMES ~30 ops — a wash, but the row-vector form lets the
    per-row target symbol come from ONE dynamic sublane slice of the
    [T, B] target block (~0.13 us) instead of a T-wide masked lane
    reduction (~2.9 us);
  * int16 DP cells measured ~2.7x SLOWER than int32 (Mosaic unpacks), so
    the cells stay int32.

Other exactness-preserving structure (v2 heritage):

  * eh[] is stored SHIFTED: ``eh_hs[q] = eh[q+1].h`` plus a [1, B] ``eh0``
    row for eh[0].h, and ``eh_e[q] = eh[q].e``: bwa's write pattern
    (eh[j].h = H(i, j-1) for j in (beg, end], eh[beg].h = h1, eh[j].e over
    [beg, end), eh[end].e = 0) lands exactly on the ``in_win`` mask with no
    padding or extra roll;
  * row max + argmax fuse into ONE reduction via score*Qpow+col packing
    (bwa's last-attaining-column tie-break IS the packed max);
  * the row loop is a ``while_loop`` that exits as soon as every lane is
    done (zdrop / zero-row / tlen reached).

Hot-kernel anchor: [EXT] ksw.c ksw_extend2, reached from
mem_process_seqs (jnibwa.c:214) via mem_chain2aln.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(1 << 30)  # plain int: jnp scalars would be captured consts


def packed_qpow_bound(Q: int, max_sc: int):
    """(qpow, ok) for the fused (score*qpow + col) row reduction.

    Computed from the 8-padded query width the kernel actually runs with,
    so the routing guard (extend_tpu._pallas_wave_ok) and the kernel's
    assert test the SAME int32-overflow condition (r03 advisor finding).
    """
    Qp = -(-max(Q, 1) // 8) * 8
    qpow = 1
    while qpow < max(Qp, 2):
        qpow <<= 1
    ok = (2 * Q * max(max_sc, 1) + 65536) * qpow < (1 << 31)
    return qpow, ok


def _sub_prefix_max(A, row, Q):
    """P[q] = max_{k<=q} A[k] along the sublane axis (log-step doubling)."""
    P = A
    k = 1
    while k < Q:
        shifted = pltpu.roll(P, shift=k, axis=0)
        shifted = jnp.where(row >= k, shifted, NEG_INF)
        P = jnp.maximum(P, shifted)
        k <<= 1
    return P


def _extend_kernel(
    qseq_ref,  # [Q, Bt] int32 (query columns on sublanes)
    tseq_ref,  # [T, Bt] int32
    scal_ref,  # [8, Bt] int32: rows 0..4 = qlen, tlen, h0, w_adj, bonus
    mat_ref,  # [8, 128] int32 (5x5 matrix in cols 0..4 of rows 0..4)
    out_ref,  # [8, Bt] int32: rows 0..5 = score qle tle gtle gscore max_off
    eh_hs,  # scratch [Q, Bt]: eh_hs[q] = eh[q+1].h  (shifted storage)
    eh_e,  # scratch [Q, Bt]: eh_e[q] = eh[q].e
    *,
    Q: int,
    T: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    zdrop: int,
    qpow: int,
):
    Bt = qseq_ref.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = scal_ref[0:1, :]
    tlen = scal_ref[1:2, :]
    h0 = scal_ref[2:3, :]
    w_adj = scal_ref[3:4, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Bt), dimension=0)
    row_eins = row * e_ins
    rowm1_eins = row_eins - e_ins
    # query profile per target symbol: qp_c[j, b] = mat[c, qseq[j, b]]
    qs = qseq_ref[:, :]
    qprof = []
    for c in range(5):
        p = jnp.full((Q, Bt), mat_ref[c, 4], dtype=jnp.int32)
        for d in range(4):
            p = jnp.where(qs == d, mat_ref[c, d], p)
        qprof.append(p)
    # eh[] init in shifted storage: eh[j].h = max(h0 - oe_ins - (j-1)e, 0)
    # for 1 <= j <= qlen, eh[0].h = h0, 0 past qlen; eh[].e = 0
    init_hs = jnp.maximum(h0 - oe_ins - row_eins, 0)
    init_hs = jnp.where(row + 1 <= qlen, init_hs, 0)
    eh_hs[:, :] = init_hs
    eh_e[:, :] = jnp.zeros((Q, Bt), jnp.int32)
    mask_qlast = row == qlen - 1  # constant across target rows

    def cond(carry):
        i, _eh0, _beg, _end, done, *_rest = carry
        return (i < T) & (jnp.min(done) == 0)

    def row_body(carry):
        (i, eh0, beg, end, done, maxv, max_i, max_j, max_ie, gscore,
         max_off) = carry
        active = (done == 0) & (i < tlen)
        beg = jnp.maximum(beg, i - w_adj)
        end = jnp.minimum(jnp.minimum(end, i + w_adj + 1), qlen)
        in_win = (row >= beg) & (row < end)
        h1 = jnp.where(
            beg == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        )
        # per-row target symbol: ONE dynamic sublane slice of [T, Bt]
        tc = tseq_ref[pl.ds(i, 1), :]
        q = qprof[4]
        for c in range(4):
            q = jnp.where(tc == c, qprof[c], q)
        # Hdiag(q) = eh[q].h = eh0 at row 0, eh_hs[q-1] past it
        Hdiag = jnp.where(row == 0, eh0, pltpu.roll(eh_hs[:, :], shift=1, axis=0))
        M = jnp.where(in_win & (Hdiag != 0), Hdiag + q, 0)
        E = jnp.where(in_win, eh_e[:, :], 0)
        Mc = jnp.maximum(M - oe_ins, 0)
        P = _sub_prefix_max(Mc + row_eins, row, Q)
        Pshift = pltpu.roll(P, shift=1, axis=0)
        F = jnp.maximum(Pshift - rowm1_eins, 0)
        F = jnp.where((row >= 1) & in_win, F, 0)
        Hrow = jnp.maximum(jnp.maximum(M, E), F)
        E_next = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
        # fused row max + last-attaining argmax: packed score*qpow + col
        pk = jnp.max(
            jnp.where(in_win, Hrow * qpow + row, 0), axis=0, keepdims=True
        )
        mrow = pk // qpow
        mj = pk - mrow * qpow
        # gscore needs H(i, qlen-1); only consumed when end == qlen
        h_last = jnp.max(
            jnp.where(mask_qlast, Hrow, NEG_INF), axis=0, keepdims=True
        )
        reaches = end == qlen
        upd_g = reaches & (gscore <= h_last) & active
        gscore = jnp.where(upd_g, h_last, gscore)
        max_ie = jnp.where(upd_g, i, max_ie)
        brk_zero = mrow == 0
        improved = mrow > maxv
        di = i - max_i
        dj = mj - max_j
        # integer-space select (boolean-vector selects don't lower in Mosaic)
        zmargin = jnp.where(
            di > dj,
            maxv - mrow - (di - dj) * e_del,
            maxv - mrow - (dj - di) * e_ins,
        )
        brk_z = jnp.logical_not(improved) & (zmargin > zdrop) if zdrop > 0 else (
            jnp.zeros_like(improved)
        )
        upd = active & improved
        max_off = jnp.where(upd, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
        maxv = jnp.where(upd, mrow, maxv)
        max_i = jnp.where(upd, i, max_i)
        max_j = jnp.where(upd, mj, max_j)
        done = jnp.where(
            (i + 1 >= tlen) | (active & (brk_zero | brk_z)),
            jnp.int32(1), done,
        )
        # write back eh[] (shifted storage; bwa's exact write pattern:
        # eh[j].h = H(i, j-1) for j in (beg, end], eh[beg].h = h1,
        # eh[j].e = E(i+1, j) for j in [beg, end), eh[end].e = 0)
        win_act = in_win & active
        newh = jnp.where(win_act, Hrow, eh_hs[:, :])
        newh = jnp.where((row == beg - 1) & active, 0, newh)
        eh_hs[:, :] = newh
        newe = jnp.where(win_act, E_next, eh_e[:, :])
        newe = jnp.where((row == end) & active, 0, newe)
        eh_e[:, :] = newe
        eh0 = jnp.where((beg == 0) & active, h1, eh0)
        # window shrink over eh indices [beg, end]: alive(j) from the row
        # values themselves.  j-space part (j = row in [beg, end)):
        # newe[j] != 0 | (j == beg ? h1 != 0 : H(i, j-1) != 0); the
        # newh part for j = row+1 in (beg, end] is Hrow[row] != 0.
        HrowShift = pltpu.roll(Hrow, shift=1, axis=0)
        at_beg = row == beg  # (bool-vector selects don't lower in Mosaic)
        alive_j = in_win & (
            (E_next != 0)
            | (at_beg & (h1 != 0))
            | (jnp.logical_not(at_beg) & (HrowShift != 0))
        )
        aliveH = (Hrow != 0) & in_win  # contributes at j = row + 1
        first = jnp.min(
            jnp.minimum(
                jnp.where(alive_j, row, NEG_INF * -1),
                jnp.where(aliveH, row + 1, NEG_INF * -1),
            ),
            axis=0, keepdims=True,
        )
        last = jnp.max(
            jnp.maximum(
                jnp.where(alive_j, row, -1),
                jnp.where(aliveH, row + 1, -1),
            ),
            axis=0, keepdims=True,
        )
        any_alive = last >= 0
        beg2 = jnp.where(any_alive, first, end)
        jmax = jnp.where(any_alive, last, beg2 - 1)
        end2 = jnp.minimum(jmax + 2, qlen)
        beg = jnp.where(active, beg2, beg)
        end = jnp.where(active, end2, end)
        return (i + 1, eh0, beg, end, done, maxv, max_i, max_j, max_ie,
                gscore, max_off)

    z1 = jnp.zeros((1, Bt), jnp.int32)
    carry = (
        jnp.int32(0),  # i
        h0,  # eh0 = eh[0].h
        z1,  # beg
        qlen,  # end
        (tlen <= 0).astype(jnp.int32),  # done (int32 0/1; bools trip Mosaic)
        h0,  # maxv
        z1 - 1,  # max_i
        z1 - 1,  # max_j
        z1 - 1,  # max_ie
        z1 - 1,  # gscore
        z1,  # max_off
    )
    (_, _, beg, end, done, maxv, max_i, max_j, max_ie, gscore, max_off) = (
        jax.lax.while_loop(cond, row_body, carry)
    )
    outrow = jax.lax.broadcasted_iota(jnp.int32, (8, Bt), dimension=0)
    res = jnp.where(outrow == 0, maxv, 0)
    res = jnp.where(outrow == 1, max_j + 1, res)
    res = jnp.where(outrow == 2, max_i + 1, res)
    res = jnp.where(outrow == 3, max_ie + 1, res)
    res = jnp.where(outrow == 4, gscore, res)
    res = jnp.where(outrow == 5, max_off, res)
    out_ref[:, :] = res


@partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "zdrop", "max_sc",
                     "interpret", "b_tile"),
)
def ksw_extend_pallas(
    qseq,  # [B, Q] int32
    tseq,  # [B, T] int32
    qlen,
    tlen,
    h0,
    w,
    end_bonus,
    mat,  # [5, 5] int32
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    zdrop: int,
    max_sc: int,
    interpret: bool = False,
    b_tile: int = 512,
):
    """Drop-in equivalent of ops/extend_tpu.ksw_extend_batch."""
    B, Q = qseq.shape
    T = tseq.shape[1]
    # band preamble (same as the scan kernel)
    max_ins = ((qlen * max_sc + end_bonus - o_ins) // e_ins + 1).astype(jnp.int32)
    w_adj = jnp.minimum(w, jnp.maximum(max_ins, 1))
    max_del = ((qlen * max_sc + end_bonus - o_del) // e_del + 1).astype(jnp.int32)
    w_adj = jnp.minimum(w_adj, jnp.maximum(max_del, 1))
    # jobs ride the LANE axis: pad the batch to a 128-lane multiple (padded
    # jobs have tlen == 0 and are born done); queries/targets ride sublanes
    # (8-multiples; padded positions sit past qlen/tlen and never activate)
    Qp = -(-Q // 8) * 8
    Tp = -(-T // 8) * 8
    # keep the resident block (5 qprof + 2 eh + qseq + temps ~9 Q-rows, plus
    # the target block) inside a conservative VMEM budget; lanes stay a
    # 128-multiple so long-read buckets shrink the tile instead of spilling
    vmem_cap = (8 << 20) // ((9 * Qp + Tp) * 4)
    Bt = max(128, min(b_tile, (vmem_cap // 128) * 128))
    Bp = -(-B // Bt) * Bt
    scal = jnp.zeros((8, Bp), jnp.int32)
    for i, v in enumerate((qlen, tlen, h0, w_adj, end_bonus)):
        scal = scal.at[i, :B].set(v.astype(jnp.int32))
    mat_block = jnp.zeros((8, 128), jnp.int32)
    mat_block = mat_block.at[:5, :5].set(mat.astype(jnp.int32))
    qseq_t = jnp.zeros((Qp, Bp), jnp.int32).at[:Q, :B].set(
        qseq.astype(jnp.int32).T
    )
    tseq_t = jnp.zeros((Tp, Bp), jnp.int32).at[:T, :B].set(
        tseq.astype(jnp.int32).T
    )
    qpow, pack_ok = packed_qpow_bound(Q, max_sc)
    # packed (score*qpow + col) row reduction must stay inside int32: score
    # is bounded by 2*Q*max_sc + max h0/bonus headroom
    assert pack_ok, (Q, max_sc)
    kernel = partial(
        _extend_kernel, Q=Qp, T=Tp, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, zdrop=zdrop, qpow=qpow,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec((Qp, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Qp, Bt), jnp.int32),
            pltpu.VMEM((Qp, Bt), jnp.int32),
        ],
        interpret=interpret,
    )(qseq_t, tseq_t, scal, mat_block)
    return dict(
        score=out[0, :B],
        qle=out[1, :B],
        tle=out[2, :B],
        gtle=out[3, :B],
        gscore=out[4, :B],
        max_off=out[5, :B],
    )
