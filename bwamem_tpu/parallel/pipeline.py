"""End-to-end alignment over a device mesh.

The reference's cluster story is a doc comment ("ship the image, mmap per
JVM, Spark partitions align independently", BwaMemIndex.java:22-27).  Here
it is executable: the read batch's device compute — the banded-SW extension
waves — runs data-parallel over a ``jax.sharding.Mesh`` (the wave kernel is
elementwise over its batch axis, so XLA partitions it across the mesh with
zero communication), while the per-read finalize/pairing tail merges
records back in input order, coordinate-complete.

Record output is asserted identical to the single-device path
(tests/test_mesh_pipeline.py; __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import contextlib
import os
from typing import List, Optional, Tuple

import numpy as np

from ..api.options import MemOptions
from ..engine.finalize import Aln, mark_primary_se, reorder_primary5
from ..engine.pipeline import Engine, align_regs_batch, reg2sam_records
from ..engine import pair as pair_mod
from ..ops.extend_tpu import active_mesh


@contextlib.contextmanager
def _wave_env():
    """Force the cross-read device-wave extension path."""
    saved = {
        k: os.environ.get(k)
        for k in ("BWAMEM_TPU_DEVICE_EXTEND", "BWAMEM_TPU_FORCE_WAVES")
    }
    os.environ["BWAMEM_TPU_DEVICE_EXTEND"] = "1"
    os.environ["BWAMEM_TPU_FORCE_WAVES"] = "1"
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def align_seqs_mesh(
    opt: MemOptions,
    eng: Engine,
    reads: List[np.ndarray],
    mesh,
    is_pe: bool = False,
    pes: Optional[List[pair_mod.PeStat]] = None,
    id_base: int = 0,
) -> List[List[Aln]]:
    """Align a batch with extension waves sharded over ``mesh``.

    Produces records identical to the single-device engine paths: seeding
    and chaining run on the host, every extension wave is dispatched as one
    sharded device computation, and the finalize/pairing tail emits the
    same per-read record lists the aligner's oracle path does.
    """
    with _wave_env(), active_mesh(mesh):
        regs_all = align_regs_batch(opt, eng, reads)
    out: List[List[Aln]] = []
    if is_pe:
        if len(reads) % 2:
            raise ValueError("paired mesh alignment needs an even batch")
        if pes is None:
            pes = pair_mod.pestat(opt, eng.idx.bns.l_pac, regs_all)
        for i in range(len(reads) // 2):
            alns0, alns1 = pair_mod.sam_pe(
                opt, eng, pes, id_base + i,
                (reads[2 * i], reads[2 * i + 1]),
                [regs_all[2 * i], regs_all[2 * i + 1]],
            )
            out.append(alns0)
            out.append(alns1)
    else:
        from ..api.options import MEM_F_PRIMARY5

        for i, (read, regs) in enumerate(zip(reads, regs_all)):
            mark_primary_se(opt, regs, id_base + i)
            if opt.flag & MEM_F_PRIMARY5:
                reorder_primary5(opt.T, regs)
            out.append(reg2sam_records(opt, eng, read, regs))
    return out


def shard_reads_hosts(
    reads: List, process_id: int, num_processes: int
) -> Tuple[int, List]:
    """Multi-host layer: contiguous per-host shard (pairs kept together)."""
    n = len(reads)
    per = (n + num_processes - 1) // num_processes
    per += per & 1  # keep mates on the same host
    lo = min(process_id * per, n)
    return lo, reads[lo : min(lo + per, n)]
