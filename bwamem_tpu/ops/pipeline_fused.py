"""ONE-dispatch device pipeline: seeding + SA walks + chaining + banded
extension for a whole read batch in a single jitted program.

The r04 device path was host-orchestrated between stages: one fused
seed+SA dispatch, a host decode, a separate chain dispatch (or host
chaining), then per-wave extension dispatches with host-built payloads
(4 waves/batch in DEVICE_E2E_r04).  Every hop pays a host<->device round
trip and re-uploads data the device already holds.  Here the entire
per-batch program runs on device:

  seed_sa_core   (ops/seed_fused.py, unchanged semantics)
    -> seed expansion  ([B, S] seeds by pure GATHERS from the walk table —
       no scatters: seed column s of read b is global walk ws[b]+s)
    -> chain_kernel    (ops/chain_tpu.py mem_chain + chain_flt, vmapped)
    -> chain2aln wave loop ([EXT] bwamem.c mem_chain2aln): per-read task
       cursors over (emit-rank, seed-len desc, idx desc)-ordered tasks,
       the contained-seed pruning against already-produced regions, and
       left/right ksw_extend2 extension with per-lane band-doubling
       retries — the extension kernel (ops/extend_tpu.py, early_exit
       row loop) runs embedded in the same program, so extension
       reference windows are gathered from the device-resident 2-bit pac
       and never cross the link.

The host pulls the packed seed tables (for per-read fallback decode) plus
fixed-shape region arrays; reads that overflow any fixed budget (M seed
slots, S seeds, C chains, R regions, T_cap reference window) or whose
length activates mem_flt_chained_seeds (>~700 bp: flt_chained_seeds stops
being a no-op — long-read path) flag themselves and fall back to the host
oracle, so output is bit-exact for every read (tests/test_pipeline_fused.py).

Anchors: the one-call batch contract this collapses into a single
dispatch is jnibwa.c:197-235 (mem_process_seqs, jnibwa.c:214); stage
semantics pin to [EXT] bwt.c/bwamem.c via the host oracles
engine/{seed,chain,extend}.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .chain_tpu import chain_kernel
from .extend_tpu import ksw_extend_batch
from .seed_fused import seed_sa_core

I32MAX = jnp.int32((1 << 31) - 1)


def _dcode(pac8, pos, l_pac):
    """Reference code at doubled-domain position(s) ([EXT] bns_get_seq).

    pac8: uint8 bwa pac bytes (4 bases/byte, MSB-first pairs); positions
    >= l_pac read the reverse complement mirrored at 2*l_pac-1-pos."""
    rev = pos >= l_pac
    fp = jnp.where(rev, 2 * l_pac - 1 - pos, pos)
    fp = jnp.clip(fp, 0, l_pac - 1)
    byte = pac8[(fp >> 2).astype(jnp.int32) if pac8.shape[0] < (1 << 31)
                else (fp >> 2)]
    shift = (2 * (3 - (fp & 3))).astype(jnp.uint8)
    code = (byte >> shift) & 3
    code = code.astype(jnp.int32)
    return jnp.where(rev, 3 - code, code)


def _max_gap(x, a, o_del, e_del, o_ins, e_ins, w):
    """cal_max_gap on int32 arrays (api/options.py max_gap, float trunc)."""
    f = x.astype(jnp.float32)
    l_del = jnp.trunc((f * a - o_del) / e_del + 1.0).astype(jnp.int32)
    l_ins = jnp.trunc((f * a - o_ins) / e_ins + 1.0).astype(jnp.int32)
    return jnp.minimum(
        jnp.maximum(jnp.maximum(l_del, l_ins), 1), jnp.int32(w << 1)
    )


def pipeline_fused_body(
    lines, L2, sa, pac8, ctg_end, ctg_off, ctg_alt, qseq, qlen, fcs_ok,
    mat, *,
    primary: int, seq_len: int, sa_intv: int, span: int, l_pac: int,
    min_seed_len: int, split_len: int, split_width: int, max_mem_intv: int,
    max_occ: int, M: int, R_cap: int, F_cap: int,
    S: int, C: int, R: int, T_cap: int,
    a: int, o_del: int, e_del: int, o_ins: int, e_ins: int, zdrop: int,
    pen_clip5: int, pen_clip3: int, w_opt: int, max_sc: int,
    max_chain_gap: int, min_chain_weight: int, max_chain_extend: int,
    mask_level: float, drop_ratio: float,
):
    B, L = qseq.shape
    cdt = L2.dtype
    CMAX = jnp.asarray(jnp.iinfo(cdt).max, cdt)
    lane = jnp.arange(B)

    core = seed_sa_core(
        lines, L2, sa, qseq, qlen, primary=primary, seq_len=seq_len,
        sa_intv=sa_intv, span=span, min_seed_len=min_seed_len,
        split_len=split_len, split_width=split_width,
        max_mem_intv=max_mem_intv, max_occ=max_occ, M=M, R_cap=R_cap,
        F_cap=F_cap,
    )
    flat, n, seed_ovf = core["flat"], core["n"], core["ovf"]
    qlen32 = qlen.astype(jnp.int32)

    # ---- per-read walk spans + [B, S] seed expansion (gathers only) -----
    cum0 = jnp.concatenate([jnp.zeros(1, core["cum"].dtype), core["cum"]])
    se_ = core["starts"]  # exclusive per-read flat-row starts [B] int32
    row_end = jnp.clip(se_ + n, 0, F_cap)
    ws_read = cum0[jnp.clip(se_, 0, F_cap)].astype(jnp.int32)
    wcount = cum0[row_end].astype(jnp.int32) - ws_read
    mem_ovf = core["total_mems"] > F_cap
    walk_ovf = core["total"] > R_cap

    scol = jnp.arange(S, dtype=jnp.int32)[None, :]
    g = ws_read[:, None] + scol  # [B, S] global walk index
    nseed = jnp.minimum(wcount, S)
    svalid = scol < nseed[:, None]
    seed_sovf = wcount > S
    gc = jnp.clip(g, 0, R_cap - 1)
    mi = jnp.clip(core["mem_idx"][gc], 0, F_cap - 1)
    qbqe = flat[mi, 3]
    sqb = jnp.where(svalid, (qbqe >> 16).astype(jnp.int32), 0)
    sqe = jnp.where(svalid, (qbqe & 0xFFFF).astype(jnp.int32), 0)
    slen = sqe - sqb
    srbeg = jnp.where(svalid, core["rbegs"][gc], 0)

    # ---- mem_chain + mem_chain_flt ---------------------------------------
    assign, crid, _weight, _nch, order, _kept, _first, emit, chovf = (
        chain_kernel(
            srbeg, sqb, slen, nseed, qlen32,
            ctg_end, ctg_alt,
            jnp.int32(w_opt), jnp.int32(max_chain_gap),
            jnp.int32(min_chain_weight), jnp.int32(min_seed_len),
            jnp.int32(max_chain_extend), jnp.float32(mask_level),
            jnp.float32(drop_ratio),
            S=S, C=C, l_pac=l_pac,
        )
    )

    # sorted-space -> slot inverse permutation; per-seed task eligibility
    rank_of_slot = jnp.argsort(order, axis=1).astype(jnp.int32)  # [B, C]
    emit_sorted = emit  # [B, C] bool in sorted space
    scc = jnp.clip(assign, 0, C - 1)
    s_rank = jnp.take_along_axis(rank_of_slot, scc, axis=1)
    s_emit = (
        jnp.take_along_axis(emit_sorted, s_rank, axis=1)
        & (assign >= 0)
        & svalid
    )
    # task order: (chain emit-rank asc, seed len desc, seed idx desc) —
    # exactly the host's per-chain srt walk from the largest seed down
    key = (s_rank * (L + 1) + (L - slen)) * S + (S - 1 - scol)
    key = jnp.where(s_emit, key, I32MAX)
    taskperm = jnp.argsort(key, axis=1).astype(jnp.int32)  # [B, S]
    ntask = s_emit.sum(axis=1).astype(jnp.int32)

    # ---- per-chain extension windows ([EXT] mem_chain2aln rmax + clamp) --
    mg_qb = _max_gap(sqb, a, o_del, e_del, o_ins, e_ins, w_opt)
    tail = qlen32[:, None] - sqe
    mg_tl = _max_gap(tail, a, o_del, e_del, o_ins, e_ins, w_opt)
    sb = srbeg - (sqb + mg_qb).astype(cdt)
    se2 = srbeg + slen.astype(cdt) + (tail + mg_tl).astype(cdt)
    r0_cols, r1_cols, fr_cols = [], [], []
    for c in range(C):
        mask = (assign == c) & svalid
        r0_cols.append(jnp.min(jnp.where(mask, sb, CMAX), axis=1))
        r1_cols.append(jnp.max(jnp.where(mask, se2, 0), axis=1))
        fidx = jnp.argmax(mask, axis=1)  # first seed (enumeration order)
        fr_cols.append(srbeg[lane, fidx])
    rmax0 = jnp.maximum(jnp.stack(r0_cols, axis=1), 0)
    rmax1 = jnp.minimum(jnp.stack(r1_cols, axis=1), 2 * l_pac)
    frbeg = jnp.stack(fr_cols, axis=1)  # [B, C] first-seed rbeg
    cross = (rmax0 < l_pac) & (l_pac < rmax1)
    first_fwd = frbeg < l_pac
    rmax1 = jnp.where(cross & first_fwd, l_pac, rmax1)
    rmax0 = jnp.where(cross & ~first_fwd, l_pac, rmax0)
    # clamp to the first seed's contig ([EXT] bns_fetch_seq)
    is_rev = frbeg >= l_pac
    fwd_mid = jnp.where(is_rev, 2 * l_pac - 1 - frbeg, frbeg)
    rid_c = jnp.searchsorted(
        ctg_end.astype(cdt), fwd_mid, side="right"
    ).astype(jnp.int32)
    ncl = jnp.clip(rid_c, 0, ctg_end.shape[0] - 1)
    far_beg = ctg_off.astype(cdt)[ncl]
    far_end = ctg_end.astype(cdt)[ncl]
    fb2 = jnp.where(is_rev, 2 * l_pac - far_end, far_beg)
    fe2 = jnp.where(is_rev, 2 * l_pac - far_beg, far_end)
    rmax0 = jnp.maximum(rmax0, fb2)
    rmax1 = jnp.minimum(rmax1, fe2)
    win_ovf_c = (rmax1 - rmax0) > T_cap

    # ---- chain2aln wave loop --------------------------------------------
    jq = jnp.arange(L, dtype=jnp.int32)[None, :]
    jt = jnp.arange(T_cap, dtype=jnp.int32)[None, :]
    rr = jnp.arange(R, dtype=jnp.int32)[None, :]
    zR = jnp.zeros((B, R), jnp.int32)
    zRc = jnp.zeros((B, R), cdt)
    th_of = lambda aw: (aw >> 1) + (aw >> 2)

    def _ext(qa, ta, ql_, tl_, h0_, w_, bonus):
        return ksw_extend_batch(
            qa, ta, ql_, tl_, h0_, w_,
            jnp.full((B,), bonus, jnp.int32), mat,
            o_del, e_del, o_ins, e_ins, zdrop, max_sc, early_exit=True,
        )

    def _ext_retry(qa, ta, ql_, tl_, h0_, bonus, act, prev0_differs, prev0):
        """MAX_BAND_TRY=2 band-doubling: attempt at w, selective retry at
        2w for lanes whose score moved and max_off crossed the threshold.
        prev0_differs: attempt-0 'score != prev' literal (True for left —
        prev is -1; right compares against h0)."""
        w0 = jnp.full((B,), w_opt, jnp.int32)
        r1 = _ext(qa, ta, ql_, tl_, h0_, w0, bonus)
        moved = prev0_differs if prev0 is None else (r1["score"] != prev0)
        retry = act & moved & (r1["max_off"] >= th_of(w0))

        def do_retry(_):
            w1 = jnp.where(retry, w0 << 1, w0)
            tl2 = jnp.where(retry, tl_, 0)
            ql2 = jnp.where(retry, ql_, 0)
            r2 = _ext(qa, ta, ql2, tl2, h0_, w1, bonus)
            return {k: jnp.where(retry, r2[k], r1[k]) for k in r1}

        res = jax.lax.cond(retry.any(), do_retry, lambda _: r1, None)
        aw = jnp.where(retry, w_opt << 1, w_opt)
        return res, aw

    def prune_current(tc, alive, regs):
        (r_rb, r_re, r_qb, r_qe, _sc, _ts, r_w, _scov, r_sl0, _rid,
         nregs) = regs
        act = tc < ntask
        si = jnp.take_along_axis(
            taskperm, jnp.clip(tc, 0, S - 1)[:, None], axis=1
        )[:, 0]
        s_qb = sqb[lane, si]
        s_len = slen[lane, si]
        s_rbeg = srbeg[lane, si]
        c = scc[lane, si]
        # contained in an existing region? ([EXT] chain2aln srt prune)
        pv = rr < nregs[:, None]
        box = (
            (s_rbeg[:, None] >= r_rb)
            & (s_rbeg[:, None] + s_len[:, None] <= r_re)
            & (s_qb[:, None] >= r_qb)
            & (s_qb[:, None] + s_len[:, None] <= r_qe)
        )
        lenok = (
            (s_len[:, None] - r_sl0).astype(jnp.float32)
            <= 0.1 * qlen32.astype(jnp.float32)[:, None]
        )
        qd1 = s_qb[:, None] - r_qb
        rd1 = jnp.clip(s_rbeg[:, None] - r_rb, -(1 << 20), 1 << 20).astype(
            jnp.int32
        )
        w1 = jnp.minimum(
            _max_gap(jnp.minimum(qd1, rd1), a, o_del, e_del, o_ins, e_ins,
                     w_opt),
            r_w,
        )
        chk1 = (qd1 - rd1 < w1) & (rd1 - qd1 < w1)
        qd2 = r_qe - (s_qb[:, None] + s_len[:, None])
        rd2 = jnp.clip(
            r_re - (s_rbeg[:, None] + s_len[:, None]).astype(cdt),
            -(1 << 20), 1 << 20,
        ).astype(jnp.int32)
        w2 = jnp.minimum(
            _max_gap(jnp.minimum(qd2, rd2), a, o_del, e_del, o_ins, e_ins,
                     w_opt),
            r_w,
        )
        chk2 = (qd2 - rd2 < w2) & (rd2 - qd2 < w2)
        contained = (pv & box & lenok & (chk1 | chk2)).any(axis=1)
        # same-chain later-srt seed suggesting a different alignment?
        samec = (assign == c[:, None]) & svalid & alive
        after = (slen > s_len[:, None]) | (
            (slen == s_len[:, None]) & (scol > si[:, None])
        )
        big = slen.astype(jnp.float32) >= s_len.astype(jnp.float32)[
            :, None
        ] * jnp.float32(0.95)
        dq = jnp.clip(srbeg - s_rbeg[:, None], -(1 << 20), 1 << 20).astype(
            jnp.int32
        )
        c1 = (
            (s_qb[:, None] <= sqb)
            & (s_qb[:, None] + s_len[:, None] - sqb >= (s_len[:, None] >> 2))
            & (sqb - s_qb[:, None] != dq)
        )
        c2 = (
            (sqb <= s_qb[:, None])
            & (sqb + slen - s_qb[:, None] >= (s_len[:, None] >> 2))
            & (s_qb[:, None] - sqb != -dq)
        )
        diff = (samec & after & big & (c1 | c2)).any(axis=1)
        pruned = act & contained & ~diff
        return act, si, c, pruned

    def outer_cond(st):
        tc = st[0]
        return (tc < ntask).any()

    def outer_body(st):
        tc, alive, regs, povf = st

        # advance each lane's cursor past pruned tasks (marks them dead)
        def adv_cond(st2):
            return st2[2].any()

        def adv_body(st2):
            tc2, alive2, pr = st2
            si = jnp.take_along_axis(
                taskperm, jnp.clip(tc2, 0, S - 1)[:, None], axis=1
            )[:, 0]
            kill = (scol == si[:, None]) & pr[:, None]
            alive2 = alive2 & ~kill
            tc2 = tc2 + pr.astype(jnp.int32)
            _, _, _, pr2 = prune_current(tc2, alive2, regs)
            return tc2, alive2, pr2

        _, _, _, pr0 = prune_current(tc, alive, regs)
        tc, alive, _ = jax.lax.while_loop(
            adv_cond, adv_body, (tc, alive, pr0)
        )

        act, si, c, _ = prune_current(tc, alive, regs)
        s_qb = sqb[lane, si]
        s_len = slen[lane, si]
        s_qe = s_qb + s_len
        s_rbeg = srbeg[lane, si]
        r0c = rmax0[lane, c]
        r1c = rmax1[lane, c]
        povf = povf | (act & win_ovf_c[lane, c])

        # ---- left extension (reversed prefix) ---------------------------
        has_l = act & (s_qb > 0)
        ql_l = jnp.where(has_l, s_qb, 0)
        tl_l = jnp.where(
            has_l, jnp.clip((s_rbeg - r0c).astype(jnp.int32), 0, T_cap), 0
        )
        qa_l = jnp.take_along_axis(
            qseq.astype(jnp.int32),
            jnp.clip(s_qb[:, None] - 1 - jq, 0, L - 1),
            axis=1,
        )
        qa_l = jnp.where(jq < ql_l[:, None], qa_l, 0)
        tpos_l = s_rbeg[:, None] - 1 - jt.astype(cdt)
        ta_l = _dcode(pac8, jnp.clip(tpos_l, 0, 2 * l_pac - 1), l_pac)
        ta_l = jnp.where(jt < tl_l[:, None], ta_l, 0)
        h0 = s_len * jnp.int32(a)
        res_l, aw0 = _ext_retry(
            qa_l, ta_l, ql_l, tl_l, h0, pen_clip5, has_l,
            jnp.ones(B, bool), None,
        )
        g_ok = (res_l["gscore"] <= 0) | (
            res_l["gscore"] <= res_l["score"] - pen_clip5
        )
        sc_left = jnp.where(has_l, res_l["score"], h0)
        qb_f = jnp.where(
            has_l, jnp.where(g_ok, s_qb - res_l["qle"], 0), 0
        )
        rb_f = jnp.where(
            has_l,
            s_rbeg - jnp.where(g_ok, res_l["tle"], res_l["gtle"]).astype(cdt),
            s_rbeg,
        )
        truesc = jnp.where(
            has_l, jnp.where(g_ok, sc_left, res_l["gscore"]), h0
        )
        aw0 = jnp.where(has_l, aw0, w_opt)

        # ---- right extension --------------------------------------------
        has_r = act & (s_qe != qlen32)
        ql_r = jnp.where(has_r, qlen32 - s_qe, 0)
        re_off = s_rbeg + s_len.astype(cdt)
        tl_r = jnp.where(
            has_r, jnp.clip((r1c - re_off).astype(jnp.int32), 0, T_cap), 0
        )
        qa_r = jnp.take_along_axis(
            qseq.astype(jnp.int32),
            jnp.clip(s_qe[:, None] + jq, 0, L - 1),
            axis=1,
        )
        qa_r = jnp.where(jq < ql_r[:, None], qa_r, 0)
        tpos_r = re_off[:, None] + jt.astype(cdt)
        ta_r = _dcode(pac8, jnp.clip(tpos_r, 0, 2 * l_pac - 1), l_pac)
        ta_r = jnp.where(jt < tl_r[:, None], ta_r, 0)
        sc0 = sc_left
        res_r, aw1 = _ext_retry(
            qa_r, ta_r, ql_r, tl_r, sc0, pen_clip3, has_r, None, sc0
        )
        g_ok_r = (res_r["gscore"] <= 0) | (
            res_r["gscore"] <= res_r["score"] - pen_clip3
        )
        score_f = jnp.where(has_r, res_r["score"], sc_left)
        qe_f = jnp.where(
            has_r, jnp.where(g_ok_r, s_qe + res_r["qle"], qlen32), qlen32
        )
        qe_f = jnp.where(has_r, qe_f, qlen32)
        qe_f = jnp.where(~has_r & act, qlen32, qe_f)
        re_f = jnp.where(
            has_r,
            re_off + jnp.where(g_ok_r, res_r["tle"], res_r["gtle"]).astype(
                cdt
            ),
            re_off,
        )
        truesc = jnp.where(
            has_r,
            truesc + jnp.where(
                g_ok_r, score_f - sc0, res_r["gscore"] - sc0
            ),
            truesc,
        )
        aw1 = jnp.where(has_r, aw1, w_opt)

        # ---- finalize the region ----------------------------------------
        inbox = (
            (assign == c[:, None]) & svalid
            & (sqb >= qb_f[:, None]) & (sqb + slen <= qe_f[:, None])
            & (srbeg >= rb_f[:, None])
            & (srbeg + slen.astype(cdt) <= re_f[:, None])
        )
        seedcov = jnp.where(inbox, slen, 0).sum(axis=1)
        w_f = jnp.maximum(aw0, aw1)
        rid_f = crid[lane, c]

        (r_rb, r_re, r_qb, r_qe, r_sc, r_ts, r_w, r_scov, r_sl0, r_rid,
         nregs) = regs
        sel = (rr == jnp.clip(nregs, 0, R - 1)[:, None]) & act[:, None]
        put = lambda arr, v: jnp.where(sel, v[:, None].astype(arr.dtype), arr)
        regs = (
            put(r_rb, rb_f), put(r_re, re_f), put(r_qb, qb_f),
            put(r_qe, qe_f), put(r_sc, score_f), put(r_ts, truesc),
            put(r_w, w_f), put(r_scov, seedcov), put(r_sl0, s_len),
            put(r_rid, rid_f),
            nregs + act.astype(jnp.int32),
        )
        povf = povf | (act & (nregs >= R))
        tc = tc + act.astype(jnp.int32)
        return tc, alive, regs, povf

    regs0 = (zRc, zRc, zR, zR, zR, zR, zR, zR, zR, zR, jnp.zeros(B, jnp.int32))
    povf0 = (
        seed_ovf | seed_sovf | chovf | ~fcs_ok
        | jnp.broadcast_to(mem_ovf | walk_ovf, seed_ovf.shape)
    )
    tc0 = jnp.where(povf0, ntask, jnp.zeros(B, jnp.int32))  # skip ovf lanes
    _, _, regs_fin, povf = jax.lax.while_loop(
        outer_cond, outer_body,
        (tc0, jnp.ones((B, S), bool), regs0, povf0),
    )

    # ---- pack -----------------------------------------------------------
    (r_rb, r_re, r_qb, r_qe, r_sc, r_ts, r_w, r_scov, r_sl0, r_rid,
     nregs) = regs_fin
    meta = (n + (seed_ovf.astype(jnp.int32) << 16)).astype(cdt)
    extra = jnp.concatenate(
        [
            core["rbegs"], core["total"][None].astype(cdt),
            core["total_mems"][None].astype(cdt), meta,
        ]
    )
    regs_c = jnp.stack([r_rb, r_re], axis=2)  # [B, R, 2] cdt
    regs_i = jnp.stack(
        [r_qb, r_qe, r_sc, r_ts, r_w, r_scov, r_sl0, r_rid], axis=2
    )  # [B, R, 8] int32
    info = jnp.stack(
        [nregs, povf.astype(jnp.int32)], axis=1
    )  # [B, 2] int32
    return flat, extra, regs_c, regs_i, info


pipeline_fused_kernel = partial(
    jax.jit,
    static_argnames=(
        "primary", "seq_len", "sa_intv", "span", "l_pac", "min_seed_len",
        "split_len", "split_width", "max_mem_intv", "max_occ", "M",
        "R_cap", "F_cap", "S", "C", "R", "T_cap", "a", "o_del", "e_del",
        "o_ins", "e_ins", "zdrop", "pen_clip5", "pen_clip3", "w_opt",
        "max_sc", "max_chain_gap", "min_chain_weight", "max_chain_extend",
        "mask_level", "drop_ratio",
    ),
)(pipeline_fused_body)
