"""Pallas TPU kernel for batched banded-SW extension.

Same exact semantics as ops/extend_tpu.ksw_extend_batch (itself bit-exact
with [EXT] ksw_extend2 via the host oracle), but the whole DP runs inside
one Pallas kernel with the row state resident in VMEM for all T rows — no
HBM round-trips between rows, which is what bounds the XLA-scan
formulation.

Layout: batch on sublanes, query columns on lanes (128-aligned).  The
horizontal-gap prefix-max runs as log2(Q) roll+max steps on the VPU.  Grid
partitions the batch into VMEM-sized tiles.

v2 design notes (relay-free device timing drove these — see
benchmarks/device_time.py):

  * eh[] is stored SHIFTED: ``eh_hs[col] = eh[col+1].h`` plus a [Bt,1]
    ``eh0`` column for eh[0].h, and ``eh_e[col] = eh[col].e``.  bwa's write
    pattern (eh[j].h = H(i, j-1) for j in (beg, end], eh[beg].h = h1,
    eh[j].e over [beg, end), eh[end].e = 0) then lands exactly on the
    ``in_win`` mask with NO pad/roll of the row values and NO (Q+128)-wide
    arrays — on the VPU an op on [Bt, Q+128] costs double one on [Bt, Q].
  * row max + argmax fuse into ONE lane reduction via score*Qpow+col
    packing (bwa's last-attaining-column tie-break is exactly the packed
    max); the window-shrink scan needs two reductions (first/last alive)
    derived from Hrow/E_next directly instead of three passes over the
    written-back arrays.
  * the row loop is a ``while_loop`` that exits as soon as every lane is
    done (zdrop / zero-row / tlen reached) — lockstep waves with mixed
    tlen stop at the last live lane, not at the bucket bound.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(1 << 30)  # plain int: jnp scalars would be captured consts


def _lane_prefix_max(A, Q):
    """P[j] = max_{k<=j} A[k] along the lane axis (log-step doubling)."""
    col = jax.lax.broadcasted_iota(jnp.int32, A.shape, dimension=1)
    P = A
    k = 1
    while k < Q:
        shifted = pltpu.roll(P, shift=k, axis=1)
        shifted = jnp.where(col >= k, shifted, NEG_INF)
        P = jnp.maximum(P, shifted)
        k <<= 1
    return P


def _extend_kernel(
    qseq_ref,  # [Bt, Q] int32
    tseq_ref,  # [Bt, T] int32
    scal_ref,  # [Bt, 128] int32: cols 0..4 = qlen, tlen, h0, w_adj, bonus
    mat_ref,  # [8, 128] int32 (5x5 matrix in cols 0..4 of rows 0..4)
    out_ref,  # [Bt, 128] int32: cols 0..5 = score qle tle gtle gscore max_off
    eh_hs,  # scratch [Bt, Q]: eh_hs[col] = eh[col+1].h  (shifted storage)
    eh_e,  # scratch [Bt, Q]: eh_e[col] = eh[col].e
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
    Bt = qseq_ref.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = scal_ref[:, 0:1]
    tlen = scal_ref[:, 1:2]
    h0 = scal_ref[:, 2:3]
    w_adj = scal_ref[:, 3:4]
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, Q), dimension=1)
    colT = jax.lax.broadcasted_iota(jnp.int32, (Bt, T), dimension=1)
    col_eins = col * e_ins
    colm1_eins = col_eins - e_ins
    # query profile per target symbol: qp_c[b, j] = mat[c, qseq[b, j]]
    qs = qseq_ref[:, :]
    qprof = []
    for c in range(5):
        p = jnp.full((Bt, Q), mat_ref[c, 4], dtype=jnp.int32)
        for d in range(4):
            p = jnp.where(qs == d, mat_ref[c, d], p)
        qprof.append(p)
    # eh[] init in shifted storage: eh[j].h = max(h0 - oe_ins - (j-1)e, 0)
    # for 1 <= j <= qlen, eh[0].h = h0, 0 past qlen; eh[].e = 0
    init_hs = jnp.maximum(h0 - oe_ins - col_eins, 0)
    init_hs = jnp.where(col + 1 <= qlen, init_hs, 0)
    eh_hs[:, :] = init_hs
    eh_e[:, :] = jnp.zeros((Bt, Q), jnp.int32)

    def cond(carry):
        i, _eh0, _beg, _end, done, *_rest = carry
        return (i < T) & (jnp.min(done) == 0)

    def row_body(carry):
        (i, eh0, beg, end, done, maxv, max_i, max_j, max_ie, gscore,
         max_off) = carry
        active = (done == 0) & (i < tlen)
        beg = jnp.maximum(beg, i - w_adj)
        end = jnp.minimum(jnp.minimum(end, i + w_adj + 1), qlen)
        in_win = (col >= beg) & (col < end)
        h1 = jnp.where(
            beg == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        )
        # per-row target symbol: masked reduce (dynamic lane slices must be
        # 128-aligned on TPU, so pick column i via compare+max instead)
        tc = jnp.max(
            jnp.where(colT == i, tseq_ref[:, :], -1), axis=1, keepdims=True
        )
        q = qprof[4]
        for c in range(4):
            q = jnp.where(tc == c, qprof[c], q)
        # Hdiag(col) = eh[col].h = eh0 at col 0, eh_hs[col-1] past it
        Hdiag = jnp.where(col == 0, eh0, pltpu.roll(eh_hs[:, :], shift=1, axis=1))
        M = jnp.where(in_win & (Hdiag != 0), Hdiag + q, 0)
        E = jnp.where(in_win, eh_e[:, :], 0)
        Mc = jnp.maximum(M - oe_ins, 0)
        P = _lane_prefix_max(Mc + col_eins, Q)
        Pshift = pltpu.roll(P, shift=1, axis=1)
        F = jnp.maximum(Pshift - colm1_eins, 0)
        F = jnp.where((col >= 1) & in_win, F, 0)
        Hrow = jnp.maximum(jnp.maximum(M, E), F)
        E_next = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
        # fused row max + last-attaining argmax: packed score*qpow + col
        pk = jnp.max(
            jnp.where(in_win, Hrow * qpow + col, 0), axis=1, keepdims=True
        )
        mrow = pk // qpow
        mj = pk - mrow * qpow
        # gscore needs H(i, qlen-1); only consumed when end == qlen
        h_last = jnp.max(
            jnp.where(col == qlen - 1, Hrow, NEG_INF), axis=1, keepdims=True
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
        newh = jnp.where((col == beg - 1) & active, 0, newh)
        eh_hs[:, :] = newh
        newe = jnp.where(win_act, E_next, eh_e[:, :])
        newe = jnp.where((col == end) & active, 0, newe)
        eh_e[:, :] = newe
        eh0 = jnp.where((beg == 0) & active, h1, eh0)
        # window shrink over eh indices [beg, end]: alive(j) from the row
        # values themselves.  j-space part (j = col in [beg, end)):
        # newe[j] != 0 | (j == beg ? h1 != 0 : H(i, j-1) != 0); the
        # newh part for j = col+1 in (beg, end] is Hrow[col] != 0.
        HrowShift = pltpu.roll(Hrow, shift=1, axis=1)
        at_beg = col == beg  # (bool-vector selects don't lower in Mosaic)
        alive_j = in_win & (
            (E_next != 0)
            | (at_beg & (h1 != 0))
            | (jnp.logical_not(at_beg) & (HrowShift != 0))
        )
        aliveH = (Hrow != 0) & in_win  # contributes at j = col + 1
        first = jnp.min(
            jnp.minimum(
                jnp.where(alive_j, col, NEG_INF * -1),
                jnp.where(aliveH, col + 1, NEG_INF * -1),
            ),
            axis=1, keepdims=True,
        )
        last = jnp.max(
            jnp.maximum(
                jnp.where(alive_j, col, -1),
                jnp.where(aliveH, col + 1, -1),
            ),
            axis=1, keepdims=True,
        )
        any_alive = last >= 0
        beg2 = jnp.where(any_alive, first, end)
        jmax = jnp.where(any_alive, last, beg2 - 1)
        end2 = jnp.minimum(jmax + 2, qlen)
        beg = jnp.where(active, beg2, beg)
        end = jnp.where(active, end2, end)
        return (i + 1, eh0, beg, end, done, maxv, max_i, max_j, max_ie,
                gscore, max_off)

    z1 = jnp.zeros((Bt, 1), jnp.int32)
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
    outcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), dimension=1)
    res = jnp.where(outcol == 0, maxv, 0)
    res = jnp.where(outcol == 1, max_j + 1, res)
    res = jnp.where(outcol == 2, max_i + 1, res)
    res = jnp.where(outcol == 3, max_ie + 1, res)
    res = jnp.where(outcol == 4, gscore, res)
    res = jnp.where(outcol == 5, max_off, res)
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
    scal = jnp.zeros((B, 128), jnp.int32)
    for i, v in enumerate((qlen, tlen, h0, w_adj, end_bonus)):
        scal = scal.at[:, i].set(v.astype(jnp.int32))
    mat_block = jnp.zeros((8, 128), jnp.int32)
    mat_block = mat_block.at[:5, :5].set(mat.astype(jnp.int32))
    Bt = min(b_tile, B)
    assert B % Bt == 0, (B, Bt)
    qpow = 1
    while qpow < max(Q, 2):
        qpow <<= 1
    # packed (score*qpow + col) row reduction must stay inside int32: score
    # is bounded by 2*Q*max_sc + max h0/bonus headroom
    assert (2 * Q * max(max_sc, 1) + 65536) * qpow < (1 << 31), (Q, max_sc)
    kernel = partial(
        _extend_kernel, Q=Q, T=T, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, zdrop=zdrop, qpow=qpow,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bt, Q), jnp.int32),
            pltpu.VMEM((Bt, Q), jnp.int32),
        ],
        interpret=interpret,
    )(qseq.astype(jnp.int32), tseq.astype(jnp.int32), scal, mat_block)
    return dict(
        score=out[:, 0],
        qle=out[:, 1],
        tle=out[:, 2],
        gtle=out[:, 3],
        gscore=out[:, 4],
        max_off=out[:, 5],
    )
