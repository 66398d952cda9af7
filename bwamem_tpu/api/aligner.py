"""BwaMemAligner: per-batch alignment front end.

Usage-pattern parity with BwaMemAligner.java: construct on an open
BwaMemIndex, tweak options, call align_seqs on batches, close (or use as a
context manager).  Lightweight — one per thread (BwaMemAligner.java:18).

Record assembly reproduces the reference's binary record semantics
(fmt_BAMish, jnibwa.c:43-97) at the Python object level, including the
internal-flag 0x10000 -> SAM 0x100 mapping and bwa's idiosyncratic outie
tlen rule (jnibwa.c:79-96).
"""
from __future__ import annotations

from typing import Callable, Iterable, List, Optional, TypeVar

import numpy as np

from ..engine import pair as pair_mod
from ..engine.finalize import Aln, mark_primary_se, reorder_primary5
from ..engine.pipeline import align_regs_batch, reg2sam_records
from ..utils.encoding import seq_to_codes, seq_to_codes_batch
from .alignment import BAM_CIGAR_CHARS, BwaMemAlignment
from .exceptions import InvalidInputException
from .options import MEM_F_PE, MEM_F_PRIMARY5, MemOptions
from .pestats import DO_NOT_INFER, BwaMemPairEndStats
from .index import BwaMemIndex

T = TypeVar("T")


def _aln_to_record(p: Aln, m: Optional[Aln]) -> BwaMemAlignment:
    """Engine record -> API record, mirroring fmt_BAMish + the Java parse
    (BwaMemAligner.java:215-311)."""
    flag = p.flag
    if flag & 0x10000:
        flag |= 0x100
    flag &= 0xFFFF
    if flag & 0x4:  # unmapped
        ref_id = ref_start = ref_end = seq_start = seq_end = -1
        nm = score = sub = 0
        cigar = ""
        md = xa = None
    else:
        ref_id = p.rid
        ref_start = p.pos
        # cigar in BAM MIDNSH coding, with correct N/H rendering
        cigar = "".join(f"{ln}{BAM_CIGAR_CHARS[op + 1 if op > 2 else op]}"
                        for op, ln in p.cigar)
        ref_len = sum(ln for op, ln in p.cigar if op in (0, 2))
        seq_start = p.cigar[0][1] if p.cigar and p.cigar[0][0] == 3 else 0
        seq_len = sum(ln for op, ln in p.cigar if op in (0, 1))
        if not p.cigar:
            seq_start = seq_len = 0
            ref_end = ref_start
        else:
            ref_end = ref_start + ref_len
        seq_end = seq_start + seq_len
        nm = p.NM
        score = p.score
        sub = p.sub
        md = p.md
        xa = p.XA
    # mate block only when paired with a mapped mate ((flag & 0x9) == 1)
    if (p.flag & 0x9) == 1 and m is not None:
        mate_rid = m.rid
        mate_pos = m.pos
        if (p.flag & 0x4) or p.rid != m.rid:
            tlen = 0
        else:
            p0 = p.pos + (p.cigar_reflen() - 1 if p.is_rev else 0)
            m0 = m.pos + (m.cigar_reflen() - 1 if m.is_rev else 0)
            tlen = m0 - p0 + (-1 if p0 > m0 else (1 if p0 < m0 else 0))
    else:
        mate_rid, mate_pos, tlen = -1, -1, 0
    return BwaMemAlignment(
        sam_flag=flag,
        ref_id=ref_id,
        ref_start=ref_start,
        ref_end=ref_end,
        seq_start=seq_start,
        seq_end=seq_end,
        map_qual=p.mapq,
        n_mismatches=nm,
        aligner_score=score,
        suboptimal_score=sub,
        cigar=cigar,
        md_tag=md,
        xa_tag=xa,
        mate_ref_id=mate_rid,
        mate_ref_start=mate_pos,
        template_len=tlen,
    )


def _records_fast(
    n_reads: int, rows: np.ndarray, cig: np.ndarray, sbuf: bytes, is_pe: bool
) -> List[List[BwaMemAlignment]]:
    """Flat native record arrays -> BwaMemAlignment lists, vectorized.

    Produces exactly what _aln_to_record(records_from_arrays(...)) would —
    the fmt_BAMish semantics (flag 0x10000->0x100 mapping, outie tlen,
    jnibwa.c:43-97) computed column-wise instead of per object."""
    out: List[List[BwaMemAlignment]] = [[] for _ in range(n_reads)]
    nr = rows.shape[0]
    if nr == 0:
        return out
    text = sbuf.decode("latin-1")
    ridx = rows[:, 0]
    flag_i = rows[:, 1]
    flag = np.where(flag_i & 0x10000, flag_i | 0x100, flag_i) & 0xFFFF
    mapped = (flag & 0x4) == 0
    reflen = rows[:, 20]
    ref_id = np.where(mapped, rows[:, 2], -1)
    ref_start = np.where(mapped, rows[:, 3], -1)
    ref_end = np.where(mapped, rows[:, 3] + reflen, -1)
    seq_start = np.where(mapped, rows[:, 21], -1)
    seq_end = np.where(mapped, rows[:, 21] + rows[:, 22], -1)
    nm = np.where(mapped, rows[:, 7], 0)
    score = np.where(mapped, rows[:, 8], 0)
    sub = np.where(mapped, rows[:, 9], 0)
    # mate block only when paired with a mapped mate ((flag & 0x9) == 1);
    # the mate's representative is its first (primary) record
    counts = np.bincount(ridx, minlength=n_reads)
    starts = np.zeros(n_reads, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    if is_pe:
        mate_read = (ridx ^ 1).astype(np.int64)
        has_mate = ((flag_i & 0x9) == 1) & (counts[mate_read] > 0)
        m_idx = starts[mate_read]
        m_rid = rows[m_idx, 2]
        m_pos = rows[m_idx, 3]
        mate_rid = np.where(has_mate, m_rid, -1)
        mate_pos = np.where(has_mate, m_pos, -1)
        p0 = rows[:, 3] + np.where(rows[:, 4] != 0, reflen - 1, 0)
        m_reflen = rows[m_idx, 20]
        m0 = m_pos + np.where(rows[m_idx, 4] != 0, m_reflen - 1, 0)
        tlen = m0 - p0 + np.sign(m0 - p0)
        tlen = np.where(
            has_mate & mapped & (rows[:, 2] == m_rid), tlen, 0
        )
    else:
        mate_rid = mate_pos = np.full(nr, -1, dtype=np.int64)
        tlen = np.zeros(nr, dtype=np.int64)
    cs_off = rows[:, 18].tolist()
    cs_len = rows[:, 19].tolist()
    md_off = rows[:, 13].tolist()
    md_len = rows[:, 14].tolist()
    xa_off = rows[:, 15].tolist()
    xa_len = rows[:, 16].tolist()
    has_xa = rows[:, 17].tolist()
    cols = list(
        zip(
            flag.tolist(), ref_id.tolist(), ref_start.tolist(),
            ref_end.tolist(), seq_start.tolist(), seq_end.tolist(),
            rows[:, 6].tolist(), nm.tolist(), score.tolist(), sub.tolist(),
            mate_rid.tolist(), mate_pos.tolist(), tlen.tolist(),
        )
    )
    mapped_l = mapped.tolist()
    ridx_l = ridx.tolist()
    new = object.__new__
    cls = BwaMemAlignment
    for k in range(nr):
        (fl, rid, rs, re_, ss, se, mq, nmv, sc, sb, mrid, mpos, tl) = cols[k]
        if mapped_l[k]:
            co = cs_off[k]
            cigar = text[co : co + cs_len[k]]
            mo = md_off[k]
            md = text[mo : mo + md_len[k]]
            if has_xa[k]:
                xo = xa_off[k]
                xa = text[xo : xo + xa_len[k]]
            else:
                xa = None
        else:
            cigar = ""
            md = xa = None
        a = new(cls)
        a.__dict__.update(
            sam_flag=fl, ref_id=rid, ref_start=rs, ref_end=re_,
            seq_start=ss, seq_end=se, map_qual=mq, n_mismatches=nmv,
            aligner_score=sc, suboptimal_score=sb, cigar=cigar, md_tag=md,
            xa_tag=xa, mate_ref_id=mrid, mate_ref_start=mpos,
            template_len=tl,
        )
        out[ridx_l[k]].append(a)
    return out


class BwaMemAligner:
    def __init__(
        self,
        index: BwaMemIndex,
        options: Optional[MemOptions] = None,
        mesh=None,
        device_stages=(),
    ):
        """mesh: a ``jax.sharding.Mesh`` (see ``parallel.mesh.make_mesh``) to
        run alignment data-parallel across devices — the executable form of
        the reference's ship-the-image cluster pattern (BwaMemIndex.java:
        22-27).  device_stages (any of "seed", "chain", "sa_lookup")
        additionally runs those device kernels mesh-sharded; extension
        waves always shard when a mesh is set."""
        if not index.is_open():
            raise RuntimeError(
                "Can't create aligner: bwa-mem index has been closed"
            )
        self._index = index
        self.options = options.copy() if options else MemOptions()
        self._pe_stats: Optional[BwaMemPairEndStats] = None
        self._open = True
        self._exec_cfg = None
        if mesh is not None:
            from ..engine.exec_ctx import mesh_exec

            self._exec_cfg = mesh_exec(mesh, device_stages)
        elif device_stages:
            raise ValueError("device_stages requires a mesh")

    # ------------------------------------------------------------ lifecycle

    def is_open(self) -> bool:
        return self._open

    def close(self) -> None:
        self._open = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def index(self) -> BwaMemIndex:
        return self._index

    # ------------------------------------------------------------- PE modes

    def align_pairs(self) -> None:
        """Interleaved paired alignment (BwaMemAligner.alignPairs, :73)."""
        self.options.flag |= MEM_F_PE

    def infer_pair_end_stats(self) -> None:
        self._pe_stats = None

    def dont_infer_pair_end_stats(self) -> None:
        self._pe_stats = DO_NOT_INFER

    def set_proper_pair_end_stats(self, stats: BwaMemPairEndStats) -> None:
        self._pe_stats = stats

    # -------------------------------------------------------------- aligning

    def align_seqs(
        self,
        sequences: Iterable[T],
        func: Callable[[T], bytes] = lambda x: x,
    ) -> List[List[BwaMemAlignment]]:
        """Align a batch; one result list per input sequence
        (BwaMemAligner.alignSeqs, :181-311)."""
        seqs = [func(s) for s in sequences]
        fast = self._align_seqs_fast(seqs)
        if fast is not None:
            return fast
        raw = self.align_seqs_raw(seqs)
        return [[_aln_to_record(p, m) for p, m in per_read] for per_read in raw]

    def _align_seqs_fast(self, seqs: List[bytes]):
        """Vectorized record assembly over the native pipeline's flat
        arrays — same records as the Aln path (asserted by
        tests/test_fast_records.py), ~10x less Python-object churn.
        Returns None when the native tail can't serve this batch."""
        if not self._open:
            raise RuntimeError("The aligner has been closed.")
        from ..engine.pipeline import native_pipeline_ok
        from ..utils import metrics as _metrics

        opt = self.options
        is_pe = bool(opt.flag & MEM_F_PE)
        if is_pe and len(seqs) % 2:
            raise InvalidInputException(
                "paired alignment requires an even number of sequences"
            )
        self._index.ref_index()
        try:
            eng = self._index._require()
            reads = seq_to_codes_batch(seqs)
            if not native_pipeline_ok(eng, reads, self._exec_cfg):
                return None
            with _metrics.batch_scope():
                arrays = self._align_native_arrays(eng, opt, reads, is_pe)
                out = _records_fast(len(reads), *arrays, is_pe=is_pe)
                _metrics.count("batches")
                _metrics.count("reads", len(reads))
                _metrics.count("records", sum(len(r) for r in out))
            return out
        finally:
            self._index.de_ref_index()

    def align_seqs_raw(self, sequences: List[bytes]):
        from ..utils import metrics as _metrics

        with _metrics.batch_scope():
            out = self._align_seqs_raw_inner(sequences)
            _metrics.count("batches")
            _metrics.count("reads", len(sequences))
            _metrics.count("records", sum(len(r) for r in out))
        return out

    def _align_seqs_raw_inner(self, sequences: List[bytes]):
        """Align; returns per read a list of (Aln, mate Aln|None) engine
        records — the substrate for both the object API and the binary wire
        codec (api/wire.py)."""
        if not self._open:
            raise RuntimeError("The aligner has been closed.")
        opt = self.options
        self._index.ref_index()
        try:
            eng = self._index._require()
            reads = seq_to_codes_batch(sequences)
            if opt.flag & MEM_F_PE:
                return self._align_pe(eng, opt, reads)
            return self._align_se(eng, opt, reads)
        finally:
            self._index.de_ref_index()

    def align_seqs_packed(self, seqs_buf: bytes) -> bytes:
        """Binary in, binary out: the reference's createAlignments contract
        ([int32 n][seq NUL]* -> fmt_BAMish record stream; SURVEY.md 2.4)."""
        from . import wire

        raw = self.align_seqs_raw(wire.decode_seqs(seqs_buf))
        return wire.encode_alignments(raw)

    def _align_native_arrays(self, eng, opt, reads, is_pe: bool,
                             id_base: int = 0, id_stride: int = 1):
        """Full native pipeline (seeds -> flat record arrays in one C
        call); engine/native/pipeline.cpp, the mem_process_seqs
        equivalent.

        id_base/id_stride set the engine-visible read/pair ordinals
        (hash tie-break inputs) — streaming and sharded callers pass the
        ORIGINAL stream ordinals so output is invariant to chunking and
        partitioning."""
        from ..engine import native_pipeline
        from ..engine.pipeline import native_seed_sa
        from ..utils.timers import TIMERS

        arrays = native_seed_sa(opt, eng, reads)
        pes = None
        if is_pe and self._pe_stats is not None:
            pes = self._resolve_pes(opt, eng, None)
        with TIMERS.stage("native_tail"):
            return native_pipeline.pipeline_batch_arrays(
                opt, eng.idx, reads, *arrays, is_pe=is_pe, pes=pes,
                id_base=id_base, id_stride=id_stride,
            )

    def _align_native(self, eng, opt, reads, is_pe: bool,
                      id_base: int = 0, id_stride: int = 1):
        """Like _align_native_arrays but returns per-read Aln lists."""
        from ..engine import native_pipeline

        rows, cig, sbuf = self._align_native_arrays(
            eng, opt, reads, is_pe, id_base=id_base, id_stride=id_stride
        )
        return native_pipeline.records_from_arrays(len(reads), rows, cig, sbuf)

    def _align_se(self, eng, opt, reads):
        from ..engine.pipeline import native_pipeline_ok

        if native_pipeline_ok(eng, reads, self._exec_cfg):
            recs = self._align_native(eng, opt, reads, is_pe=False)
            return [[(a, None) for a in alns] for alns in recs]
        out = []
        regs_all = align_regs_batch(opt, eng, reads, exec_cfg=self._exec_cfg)
        for i, (read, regs) in enumerate(zip(reads, regs_all)):
            mark_primary_se(opt, regs, i)
            if opt.flag & MEM_F_PRIMARY5:
                reorder_primary5(opt.T, regs)
            alns = reg2sam_records(opt, eng, read, regs)
            out.append([(a, None) for a in alns])
        return out

    def _align_pe(self, eng, opt, reads):
        if len(reads) % 2:
            raise InvalidInputException(
                "paired alignment requires an even number of sequences"
            )
        from ..engine.pipeline import native_pipeline_ok

        if native_pipeline_ok(eng, reads, self._exec_cfg):
            recs = self._align_native(eng, opt, reads, is_pe=True)
            out = []
            for i in range(len(reads) // 2):
                alns0, alns1 = recs[2 * i], recs[2 * i + 1]
                m0 = alns0[0] if alns0 else None
                m1 = alns1[0] if alns1 else None
                out.append([(a, m1) for a in alns0])
                out.append([(a, m0) for a in alns1])
            return out
        regs = align_regs_batch(opt, eng, reads, exec_cfg=self._exec_cfg)
        pes = self._resolve_pes(opt, eng, regs)
        out = []
        for i in range(len(reads) // 2):
            r2 = [regs[2 * i], regs[2 * i + 1]]
            alns0, alns1 = pair_mod.sam_pe(
                opt, eng, pes, i, (reads[2 * i], reads[2 * i + 1]), r2
            )
            m0 = alns0[0] if alns0 else None
            m1 = alns1[0] if alns1 else None
            out.append([(a, m1) for a in alns0])
            out.append([(a, m0) for a in alns1])
        return out

    def _resolve_pes(self, opt, eng, regs) -> List[pair_mod.PeStat]:
        """PE-stats mode resolution, mirroring the JNI marshalling
        (org_..._BwaMemIndex.c:21-40): caller stats fill slot 1 (FR) only."""
        if self._pe_stats is None:  # infer from the batch
            return pair_mod.pestat(opt, eng.idx.bns.l_pac, regs)
        pes = pair_mod.default_pes()
        s = self._pe_stats
        if not s.failed:
            pes[1] = pair_mod.PeStat(
                low=s.low, high=s.high, failed=0, avg=s.average, std=s.std
            )
        return pes

    # --------------------------------------------- Java-style option surface

    def get_opts_size(self) -> int:
        return len(self.options.pack())

    def get_expected_opts_size(self) -> int:
        return 168

    # Java-style aliases for the full accessor surface
    alignSeqs = align_seqs
    alignPairs = align_pairs
    inferPairEndStats = infer_pair_end_stats
    dontInferPairEndStats = dont_infer_pair_end_stats
    setProperPairEndStats = set_proper_pair_end_stats
    getOptsSize = get_opts_size
    getExpectedOptsSize = get_expected_opts_size

    def set_intra_ctg_options(self) -> None:
        self.options.set_intra_ctg()

    setIntraCtgOptions = set_intra_ctg_options


# Generate the ~40 Java-style option accessors (BwaMemAligner.java:46-138)
_OPTION_ACCESSORS = {
    "MatchScoreOption": "a",
    "MismatchPenaltyOption": "b",
    "DGapOpenPenaltyOption": "o_del",
    "DGapExtendPenaltyOption": "e_del",
    "IGapOpenPenaltyOption": "o_ins",
    "IGapExtendPenaltyOption": "e_ins",
    "UnpairedPenaltyOption": "pen_unpaired",
    "Clip5PenaltyOption": "pen_clip5",
    "Clip3PenaltyOption": "pen_clip3",
    "BandwidthOption": "w",
    "ZDropOption": "zdrop",
    "MaxMemIntvOption": "max_mem_intv",
    "OutputScoreThresholdOption": "T",
    "FlagOption": "flag",
    "MinSeedLengthOption": "min_seed_len",
    "MinChainWeightOption": "min_chain_weight",
    "MaxChainExtendOption": "max_chain_extend",
    "SplitFactorOption": "split_factor",
    "SplitWidthOption": "split_width",
    "MaxSeedOccurencesOption": "max_occ",
    "MaxChainGapOption": "max_chain_gap",
    "NThreadsOption": "n_threads",
    "ChunkSizeOption": "chunk_size",
    "MaskLevelOption": "mask_level",
    "DropRatioOption": "drop_ratio",
    "XADropRatio": "xa_drop_ratio",
    "MaskLevelRedunOption": "mask_level_redun",
    "MapQCoefLenOption": "mapq_coef_len",
    "MapQCoefFacOption": "mapq_coef_fac",
    "MaxInsOption": "max_ins",
    "MaxMateSWOption": "max_matesw",
    "MaxXAHitsOption": "max_xa_hits",
    "MaxXAHitsAltOption": "max_xa_hits_alt",
    "ScoringMatrixOption": "mat",
}


def _make_accessors():
    for jname, field in _OPTION_ACCESSORS.items():
        def getter(self, _f=field):
            return getattr(self.options, _f)

        def setter(self, value, _f=field):
            setattr(self.options, _f, value)
            if _f in ("a", "b"):
                self.options.refresh_matrix()

        setattr(BwaMemAligner, f"get{jname}", getter)
        setattr(BwaMemAligner, f"set{jname}", setter)


_make_accessors()
