"""Command-line front end: bwa-style `index` and `mem` subcommands.

The reference is a library with no CLI; this adds the obvious operational
surface on top of the same engine so results can be diffed against
`bwa mem` SAM output directly (the parity metric in BASELINE.md).

    python -m bwamem_tpu index ref.fa [-o ref.img]
    python -m bwamem_tpu mem ref.img reads.fq [mates.fq] > out.sam
"""
from __future__ import annotations

import argparse
import sys



class _Prefetcher:
    """Double-buffered chunk reader: the next chunk is parsed on a
    background thread while the current one aligns ([EXT] kt_pipeline's
    read/process overlap in mem_process_seqs' driver)."""

    def __init__(self, make_chunk):
        import queue as _queue
        import threading as _threading

        self._q = _queue.Queue(maxsize=1)
        self._done = object()

        def run():
            while True:
                chunk = make_chunk()
                if not chunk:
                    self._q.put(self._done)
                    return
                self._q.put(chunk)

        self._t = _threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item


def _chunker(stream, chunk_bases: int, paired: bool):
    """Group reads by total base count ([EXT] mem_process_seqs chunking:
    actual_chunk_size bases per batch, pairs never split)."""

    def make_chunk():
        out = []
        bases = 0
        while bases < chunk_bases:
            try:
                if paired:
                    r1, r2 = next(stream)
                    out.append((r1, r2))
                    bases += len(r1.seq) + len(r2.seq)
                else:
                    r = next(stream)
                    out.append(r)
                    bases += len(r.seq)
            except StopIteration:
                break
        return out

    return _Prefetcher(make_chunk)


def _interleaved_pairs(it):
    """Pair up an interleaved stream (bwa mem -p smart pairing,
    MEM_F_SMARTPE, BwaMemAligner.java:76-84): reads 2i and 2i+1 are mates.
    A dangling final read is dropped with a warning, matching bwa's
    behavior on a truncated interleaved file."""
    while True:
        r1 = next(it, None)
        if r1 is None:
            return
        r2 = next(it, None)
        if r2 is None:
            print(
                "[bwamem_tpu] -p: odd number of reads in interleaved input; "
                f"dropping unpaired final read {r1.name!r}",
                file=sys.stderr,
            )
            return
        yield r1, r2


def cmd_index(args) -> int:
    import os

    from .api.index import BwaMemIndex

    out = args.output or (args.fasta + ".img")
    if args.sa_intv is not None:
        os.environ["BWAMEM_TPU_SA_INTV"] = str(args.sa_intv)
    BwaMemIndex.create_index_image_from_fasta_file(args.fasta, out)
    if args.bwa_files:
        BwaMemIndex.index_reference(args.fasta, args.fasta)
    print(f"[bwamem_tpu] wrote index image {out}", file=sys.stderr)
    return 0


def cmd_mem(args) -> int:
    import os

    from .api.aligner import BwaMemAligner
    from .api.index import BwaMemIndex
    from .api.sam import aln2sam, sam_header
    from .api.pestats import BwaMemPairEndStats
    from .engine.pipeline import (align_regs_batch, native_pipeline_ok,
                                  reg2sam_records)
    from .engine.finalize import mark_primary_se
    from .engine import finalize as finalize_mod
    from .api.options import MEM_F_PRIMARY5, MEM_F_SMARTPE
    from .engine import pair as pair_mod
    from .utils.encoding import seq_to_codes
    from .utils.fastq import read_fastx

    ref = args.reference
    if not os.path.exists(ref) and os.path.exists(ref + ".img"):
        ref = ref + ".img"
    if ref.endswith((".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        img = ref + ".img"
        if not os.path.exists(img):
            print(f"[bwamem_tpu] building index image {img}...", file=sys.stderr)
            BwaMemIndex.create_index_image_from_fasta_file(ref, img)
        ref = img
    # --shard I/N: embarrassingly-parallel cluster sharding — the pattern the
    # reference documents for Spark/Yarn deployments (ship the image to every
    # node, align disjoint read partitions, BwaMemIndex.java:22-27) as a
    # first-class flag.  Interleaved assignment (read ordinal % N == I) with
    # ids computed from the ORIGINAL stream ordinal, so hash-based tie-breaks
    # (mem_mark_primary_se's Wang hash) are identical to the unsharded run
    # and shard outputs merge to exactly the single-process SAM.
    shard_i, shard_n = 0, 1
    if getattr(args, "shard", None):
        try:
            shard_i, shard_n = (int(x) for x in args.shard.split("/"))
            if not 0 <= shard_i < shard_n:
                raise ValueError(args.shard)
        except ValueError:
            print(f"[bwamem_tpu] bad --shard {args.shard!r} (want I/N)",
                  file=sys.stderr)
            return 2

    def _take_shard(it):
        return (r for j, r in enumerate(it) if j % shard_n == shard_i)

    mesh = None
    device_stages = ()
    if getattr(args, "devices", None):
        # mesh execution: shard the device stage kernels over N devices
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, idx_shards=args.idx_shards or 1)
        if getattr(args, "device_stages", None):
            device_stages = tuple(
                s for s in args.device_stages.split(",") if s
            )
    index = BwaMemIndex(ref)
    aligner = BwaMemAligner(index, mesh=mesh, device_stages=device_stages)
    exec_cfg = aligner._exec_cfg
    opt = aligner.options
    if args.T is not None:
        opt.T = args.T
    if args.k is not None:
        opt.min_seed_len = args.k
    if args.threads is not None:
        opt.n_threads = args.threads
    out = sys.stdout
    out.write(sam_header(index._require().idx.bns.anns))
    eng = index._require()
    smart = bool(getattr(args, "smart_pairing", False))
    if smart and args.mates is not None:
        print("[bwamem_tpu] -p takes ONE interleaved file; ignoring mates "
              "argument (bwa mem -p semantics)", file=sys.stderr)
        args.mates = None
    paired = args.mates is not None or smart
    if paired:
        aligner.align_pairs()
        if smart:
            opt.flag |= MEM_F_SMARTPE
        if args.insert_mean is not None:
            aligner.set_proper_pair_end_stats(
                BwaMemPairEndStats.of(args.insert_mean, args.insert_std)
            )
        if smart:
            # shard by PAIR ordinal so mates never split across shards
            pair_src = (
                p for j, p in enumerate(_interleaved_pairs(read_fastx(args.reads)))
                if j % shard_n == shard_i
            )
        else:
            it1 = _take_shard(read_fastx(args.reads))
            it2 = _take_shard(read_fastx(args.mates))
            pair_src = zip(it1, it2)
        if args.chunk_size:
            opt.chunk_size = args.chunk_size
        chunk_bases = opt.chunk_size * max(opt.n_threads, 1)
        n_done = 0
        for batch in _chunker(pair_src, chunk_bases, paired=True):
            reads = []
            for r1, r2 in batch:
                reads.append(r1)
                reads.append(r2)
            codes = [seq_to_codes(r.seq) for r in reads]
            if native_pipeline_ok(eng, codes, exec_cfg):
                # fused native tail (seeds -> records in one C call), ids =
                # original stream pair ordinals so output is chunking- and
                # shard-invariant
                recs = aligner._align_native(
                    eng, opt, codes, is_pe=True,
                    id_base=(n_done // 2) * shard_n + shard_i,
                    id_stride=shard_n,
                )
            else:
                regs = align_regs_batch(opt, eng, codes, exec_cfg=exec_cfg)
                pes = aligner._resolve_pes(opt, eng, regs)
                recs = []
                for i in range(len(batch)):
                    alns0, alns1 = pair_mod.sam_pe(
                        opt, eng, pes, (n_done // 2 + i) * shard_n + shard_i,
                        (codes[2 * i], codes[2 * i + 1]),
                        [regs[2 * i], regs[2 * i + 1]],
                    )
                    recs.append(alns0)
                    recs.append(alns1)
            for i, (r1, r2) in enumerate(batch):
                alns0, alns1 = recs[2 * i], recs[2 * i + 1]
                m0 = alns0[0] if alns0 else None
                m1 = alns1[0] if alns1 else None
                for w, a in enumerate(alns0):
                    out.write(aln2sam(opt, eng.idx.bns.anns, r1.name,
                                      codes[2 * i], r1.qual, a, w, m1,
                                      records=alns0) + "\n")
                for w, a in enumerate(alns1):
                    out.write(aln2sam(opt, eng.idx.bns.anns, r2.name,
                                      codes[2 * i + 1], r2.qual, a, w, m0,
                                      records=alns1) + "\n")
            n_done += len(reads)
            print(f"[bwamem_tpu] processed {n_done} reads", file=sys.stderr)
    else:
        stream = _take_shard(read_fastx(args.reads))
        if args.chunk_size:
            opt.chunk_size = args.chunk_size
        chunk_bases = opt.chunk_size * max(opt.n_threads, 1)
        n_done = 0
        for batch in _chunker(stream, chunk_bases, paired=False):
            codes = [seq_to_codes(r.seq) for r in batch]
            if native_pipeline_ok(eng, codes, exec_cfg):
                recs = aligner._align_native(
                    eng, opt, codes, is_pe=False,
                    id_base=n_done * shard_n + shard_i, id_stride=shard_n,
                )
            else:
                recs = []
                regs_all = align_regs_batch(opt, eng, codes, exec_cfg=exec_cfg)
                for i, regs in enumerate(regs_all):
                    mark_primary_se(opt, regs, (n_done + i) * shard_n + shard_i)
                    if opt.flag & MEM_F_PRIMARY5:
                        finalize_mod.reorder_primary5(opt.T, regs)
                    recs.append(reg2sam_records(opt, eng, codes[i], regs))
            for i, r in enumerate(batch):
                alns = recs[i]
                for w, a in enumerate(alns):
                    out.write(
                        aln2sam(opt, eng.idx.bns.anns, r.name, codes[i],
                                r.qual, a, w, records=alns) + "\n"
                    )
            n_done += len(batch)
            print(f"[bwamem_tpu] processed {n_done} reads", file=sys.stderr)
    index.close()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bwamem_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_idx = sub.add_parser("index", help="build an index image from FASTA")
    p_idx.add_argument("fasta")
    p_idx.add_argument("-o", "--output", default=None)
    p_idx.add_argument(
        "--bwa-files", action="store_true",
        help="also write bwa-format .amb/.ann/.bwt/.pac/.sa files",
    )
    p_idx.add_argument(
        "--sa-intv", type=int, default=None,
        help="sampled-SA density (power of two; default 32 = bwa interop; "
        "8 quarters SA-walk latency for 4x sample storage; output-identical)",
    )
    p_idx.set_defaults(func=cmd_index)
    p_mem = sub.add_parser("mem", help="align reads, SAM to stdout")
    p_mem.add_argument("reference", help="index image (or FASTA to auto-index)")
    p_mem.add_argument("reads")
    p_mem.add_argument("mates", nargs="?", default=None)
    p_mem.add_argument(
        "-p", "--smart-pairing", action="store_true",
        help="smart pairing: the reads file is interleaved paired-end "
             "(bwa mem -p / MEM_F_SMARTPE); a mates file is ignored",
    )
    p_mem.add_argument("-T", type=int, default=None, help="score threshold")
    p_mem.add_argument("-k", type=int, default=None, help="min seed length")
    p_mem.add_argument(
        "-K", "--chunk-size", type=int, default=None,
        help="bases per processing chunk (mem_process_seqs chunk_size; "
             "default: the option's 10Mbp x n_threads)",
    )
    p_mem.add_argument("-t", "--threads", type=int, default=None)
    p_mem.add_argument("--insert-mean", type=float, default=None)
    p_mem.add_argument("--insert-std", type=float, default=50.0)
    p_mem.add_argument(
        "--devices", type=int, default=None,
        help="shard device-kernel batches over a mesh of N devices "
             "(parallel.mesh.make_mesh); extension waves always shard",
    )
    p_mem.add_argument(
        "--idx-shards", type=int, default=None,
        help="mesh idx-axis size (occ-table sharding; divides --devices)",
    )
    p_mem.add_argument(
        "--device-stages", default=None, metavar="S1,S2",
        help="comma list of seed,chain,sa_lookup to also run those device "
             "kernels mesh-sharded (requires --devices)",
    )
    p_mem.add_argument(
        "--shard", default=None, metavar="I/N",
        help="align only reads with ordinal %% N == I (cluster partitioning; "
             "shard outputs merge to exactly the unsharded SAM — for "
             "paired-end provide --insert-mean, since inferred insert "
             "stats are per-process by design)",
    )
    p_mem.set_defaults(func=cmd_mem)
    args = ap.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
