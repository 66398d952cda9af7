"""Pallas TPU kernel for batched banded-SW extension.

Same exact semantics as ops/extend_tpu.ksw_extend_batch (itself bit-exact
with [EXT] ksw_extend2 via the host oracle), but the whole DP runs inside
one Pallas kernel with the row state ([B_tile, Q] H/E arrays, window
bounds, trackers) resident in VMEM for all T rows — no HBM round-trips
between rows, which is what bounds the XLA-scan formulation.

Layout: batch on sublanes, query columns on lanes (128-aligned).  The
horizontal-gap prefix-max runs as log2(Q) roll+max steps on the VPU.  Grid
partitions the batch into VMEM-sized tiles.
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
    eh_h,  # scratch [Bt, Qp] (bwa eh[].h indexing: col j = H(i, j-1))
    eh_e,  # scratch [Bt, Qp]
    *,
    Q: int,
    T: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    zdrop: int,
):
    Bt = qseq_ref.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qlen = scal_ref[:, 0:1]
    tlen = scal_ref[:, 1:2]
    h0 = scal_ref[:, 2:3]
    w_adj = scal_ref[:, 3:4]
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, Q), dimension=1)
    colp = jax.lax.broadcasted_iota(jnp.int32, eh_h.shape, dimension=1)
    colT = jax.lax.broadcasted_iota(jnp.int32, (Bt, T), dimension=1)
    # query profile per target symbol: qp_c[b, j] = mat[c, qseq[b, j]]
    qs = qseq_ref[:, :]
    qprof = []
    for c in range(5):
        p = jnp.full((Bt, Q), mat_ref[c, 4], dtype=jnp.int32)
        for d in range(4):
            p = jnp.where(qs == d, mat_ref[c, d], p)
        qprof.append(p)
    # eh[] init
    init_h = jnp.maximum(h0 - oe_ins - (colp - 1) * e_ins, 0)
    init_h = jnp.where(colp == 0, h0, init_h)
    init_h = jnp.where(colp <= qlen, init_h, 0)
    eh_h[:, :] = init_h
    eh_e[:, :] = jnp.zeros(eh_h.shape, jnp.int32)

    def row_body(i, carry):
        (beg, end, done, maxv, max_i, max_j, max_ie, gscore, max_off) = carry
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
        Hdiag = eh_h[:, :Q]
        M = jnp.where(Hdiag != 0, Hdiag + q, 0)
        M = jnp.where(in_win, M, 0)
        E = jnp.where(in_win, eh_e[:, :Q], 0)
        Mc = jnp.maximum(M - oe_ins, 0)
        P = _lane_prefix_max(Mc + col * e_ins, Q)
        Pshift = pltpu.roll(P, shift=1, axis=1)
        F = jnp.where(col >= 1, Pshift - (col - 1) * e_ins, 0)
        F = jnp.maximum(F, 0)
        F = jnp.where(in_win, F, 0)
        Hrow = jnp.maximum(jnp.maximum(M, E), F)
        Hrow = jnp.where(in_win, Hrow, 0)
        E_next = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))
        E_next = jnp.where(in_win, E_next, 0)
        mrow = jnp.max(Hrow, axis=1, keepdims=True)
        mj = jnp.max(
            jnp.where((Hrow == mrow) & in_win, col, -1), axis=1, keepdims=True
        )
        # write back eh[]: col j gets H(i, j-1) for beg < j <= end, h1 at beg
        H_shift = pltpu.roll(
            jnp.pad(Hrow, ((0, 0), (0, eh_h.shape[1] - Q))), shift=1, axis=1
        )
        write_h = (colp > beg) & (colp <= end)
        newh = jnp.where(write_h, H_shift, eh_h[:, :])
        newh = jnp.where(colp == beg, h1, newh)
        E_pad = jnp.pad(E_next, ((0, 0), (0, eh_h.shape[1] - Q)))
        write_e = (colp >= beg) & (colp < end)
        newe = jnp.where(write_e, E_pad, eh_e[:, :])
        newe = jnp.where(colp == end, 0, newe)
        # gscore (needs H at col qlen-1 == newh at col qlen)
        reaches = end == qlen
        h_last = jnp.max(jnp.where(colp == qlen, newh, NEG_INF), axis=1, keepdims=True)
        active = (done == 0) & (i < tlen)
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
        # window shrink over eh indices [beg, end]
        keepb = active
        dead = (newh == 0) & (newe == 0)
        scan_mask = (colp >= beg) & (colp <= end)
        alive = jnp.logical_not(dead) & scan_mask
        any_alive = jnp.max(alive.astype(jnp.int32), axis=1, keepdims=True) > 0
        first_alive = jnp.min(
            jnp.where(alive, colp, jnp.int32(1 << 30)), axis=1, keepdims=True
        )
        beg2 = jnp.where(any_alive, first_alive, end)
        last_alive = jnp.max(jnp.where(alive, colp, -1), axis=1, keepdims=True)
        jmax = jnp.where(any_alive, last_alive, beg2 - 1)
        end2 = jnp.minimum(jmax + 2, qlen)
        # freeze finished lanes
        eh_h[:, :] = jnp.where(keepb, newh, eh_h[:, :])
        eh_e[:, :] = jnp.where(keepb, newe, eh_e[:, :])
        beg = jnp.where(keepb, beg2, beg)
        end = jnp.where(keepb, end2, end)
        return (beg, end, done, maxv, max_i, max_j, max_ie, gscore, max_off)

    z1 = jnp.zeros((Bt, 1), jnp.int32)
    carry = (
        z1,  # beg
        qlen,  # end
        z1,  # done (int32 0/1; bool carries trip Mosaic)
        h0,  # maxv
        z1 - 1,  # max_i
        z1 - 1,  # max_j
        z1 - 1,  # max_ie
        z1 - 1,  # gscore
        z1,  # max_off
    )
    (beg, end, done, maxv, max_i, max_j, max_ie, gscore, max_off) = (
        jax.lax.fori_loop(0, T, row_body, carry)
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
    Qp = Q + 128  # room for eh index Q (bwa indexing) + tile alignment
    kernel = partial(
        _extend_kernel, Q=Q, T=T, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, zdrop=zdrop,
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
            pltpu.VMEM((Bt, Qp), jnp.int32),
            pltpu.VMEM((Bt, Qp), jnp.int32),
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
