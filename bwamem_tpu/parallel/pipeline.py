"""End-to-end alignment over a device mesh.

The reference's cluster story is a doc comment ("ship the image, mmap per
JVM, Spark partitions align independently", BwaMemIndex.java:22-27).  Here
it is executable: the read batch's device compute runs data-parallel over a
``jax.sharding.Mesh`` — always the banded-SW extension waves (the wave
kernel is elementwise over its batch axis, so XLA partitions it across the
mesh with zero communication), and optionally the device seeding, chaining
and sampled-SA-lookup kernels too (``device_stages``) — while the per-read
finalize/pairing tail merges records back in input order,
coordinate-complete.

Routing is an explicit ``engine.exec_ctx.ExecConfig`` value threaded
through the pipeline (no process-global env mutation: concurrent aligners
on different meshes are safe).

Record output is asserted identical to the single-device path
(tests/test_mesh_pipeline.py; __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..api.options import MemOptions
from ..engine.exec_ctx import mesh_exec
from ..engine.finalize import Aln, mark_primary_se, reorder_primary5
from ..engine.pipeline import Engine, align_regs_batch, reg2sam_records
from ..engine import pair as pair_mod


def align_seqs_mesh(
    opt: MemOptions,
    eng: Engine,
    reads: List[np.ndarray],
    mesh,
    is_pe: bool = False,
    pes: Optional[List[pair_mod.PeStat]] = None,
    id_base: int = 0,
    device_stages: Sequence[str] = (),
) -> List[List[Aln]]:
    """Align a batch with the device stage kernels sharded over ``mesh``.

    Produces records identical to the single-device engine paths: every
    extension wave is dispatched as one sharded device computation;
    ``device_stages`` (any of "seed", "chain", "sa_lookup") additionally
    runs those stages' device kernels mesh-sharded.  The finalize/pairing
    tail emits the same per-read record lists the aligner's oracle path
    does.
    """
    cfg = mesh_exec(mesh, device_stages)
    regs_all = align_regs_batch(opt, eng, reads, exec_cfg=cfg)
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
