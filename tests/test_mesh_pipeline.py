"""End-to-end multi-device alignment (parallel/pipeline.py): a real PE
batch aligned with extension waves sharded over the 8-device CPU mesh must
be record-for-record identical to the single-device oracle path — and the
device wave kernel must actually have run, sharded.
"""
import numpy as np
import pytest

from bwamem_tpu.api.options import MEM_F_PE, MemOptions
from bwamem_tpu.engine import pair as pair_mod
from bwamem_tpu.engine.pipeline import Engine, align_regs_batch
from bwamem_tpu.index.build import build_index
from bwamem_tpu.parallel.mesh import make_mesh
from bwamem_tpu.parallel.pipeline import align_seqs_mesh, shard_reads_hosts
from bwamem_tpu.utils.fasta import Fasta, FastaContig


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(11)
    c0 = rng.integers(0, 4, 30_000).astype(np.uint8)
    idx = build_index(Fasta([FastaContig("c0", "", c0)]))
    eng = Engine(idx)
    reads = []
    for _ in range(48):
        isize = int(rng.integers(180, 300))
        start = int(rng.integers(0, len(c0) - isize - 1))
        r1 = c0[start : start + 90].copy()
        r2 = (3 - c0[start + isize - 90 : start + isize])[::-1].copy()
        for r in (r1, r2):
            for p in rng.integers(0, 90, rng.binomial(90, 0.01)):
                r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(r1)
        reads.append(r2)
    return eng, reads


def _key(a):
    return (a.flag, a.rid, a.pos, a.is_rev, a.mapq, a.NM, tuple(a.cigar),
            a.md, a.score, a.sub, a.alt_sc, a.XA)


def test_mesh_pe_equals_single_device(fixture, monkeypatch):
    eng, reads = fixture
    opt = MemOptions(flag=MEM_F_PE)
    mesh = make_mesh(8, idx_shards=2)

    # spy: the device wave kernel must run with the mesh active
    from bwamem_tpu.ops import extend_tpu

    calls = {"n": 0, "sharded": 0}
    orig = extend_tpu.ksw_extend_batch_np

    def spy(*a, **k):
        calls["n"] += 1
        if k.get("mesh") is not None or extend_tpu._ACTIVE_MESH is not None:
            calls["sharded"] += 1
        return orig(*a, **k)

    # _run_kernel imports ksw_extend_batch_np from the ops module per call,
    # so patching the module attribute intercepts every wave; drop the
    # small-wave host fallback so every wave exercises the sharded kernel
    monkeypatch.setattr(extend_tpu, "ksw_extend_batch_np", spy)
    import bwamem_tpu.engine.extend_batch as eb

    monkeypatch.setattr(eb, "HOST_FALLBACK_JOBS", 1)

    mesh_out = align_seqs_mesh(opt, eng, reads, mesh, is_pe=True)
    assert calls["n"] > 0, "device wave kernel never engaged"
    assert calls["sharded"] == calls["n"], "waves ran without the mesh active"

    regs_all = align_regs_batch(opt, eng, reads, use_device_extension=False)
    pes = pair_mod.pestat(opt, eng.idx.bns.l_pac, regs_all)
    for i in range(len(reads) // 2):
        a0, a1 = pair_mod.sam_pe(
            opt, eng, pes, i, (reads[2 * i], reads[2 * i + 1]),
            [regs_all[2 * i], regs_all[2 * i + 1]],
        )
        assert [_key(x) for x in mesh_out[2 * i]] == [_key(x) for x in a0], i
        assert [_key(x) for x in mesh_out[2 * i + 1]] == [_key(x) for x in a1], i


def test_mesh_se_equals_single_device(fixture):
    eng, reads = fixture
    opt = MemOptions()
    mesh = make_mesh(8, idx_shards=1)
    mesh_out = align_seqs_mesh(opt, eng, reads[:64], mesh, is_pe=False)
    from bwamem_tpu.engine.finalize import mark_primary_se
    from bwamem_tpu.engine.pipeline import reg2sam_records

    regs_all = align_regs_batch(opt, eng, reads[:64], use_device_extension=False)
    for i, regs in enumerate(regs_all):
        mark_primary_se(opt, regs, i)
        ref = reg2sam_records(opt, eng, reads[i], regs)
        assert [_key(x) for x in mesh_out[i]] == [_key(x) for x in ref], i


def test_mesh_full_device_stack_equals_single_device(fixture):
    """DEVICE_SEED + DEVICE_CHAIN + DEVICE_SA_LOOKUP + DEVICE_EXTEND all
    mesh-sharded in one end-to-end run, record-equal — with NO env vars."""
    import os

    for k in ("BWAMEM_TPU_DEVICE_SEED", "BWAMEM_TPU_DEVICE_CHAIN",
              "BWAMEM_TPU_DEVICE_SA_LOOKUP", "BWAMEM_TPU_DEVICE_EXTEND",
              "BWAMEM_TPU_FORCE_WAVES"):
        assert os.environ.get(k) is None, f"{k} leaked into the test env"
    eng, reads = fixture
    opt = MemOptions()
    mesh = make_mesh(8, idx_shards=1)
    sub = reads[:24]
    mesh_out = align_seqs_mesh(
        opt, eng, sub, mesh, is_pe=False,
        device_stages=("seed", "chain", "sa_lookup"),
    )
    from bwamem_tpu.engine.finalize import mark_primary_se
    from bwamem_tpu.engine.pipeline import reg2sam_records

    regs_all = align_regs_batch(opt, eng, sub, use_device_extension=False)
    for i, regs in enumerate(regs_all):
        mark_primary_se(opt, regs, i)
        ref = reg2sam_records(opt, eng, sub[i], regs)
        assert [_key(x) for x in mesh_out[i]] == [_key(x) for x in ref], i


def test_public_aligner_mesh_path(fixture):
    """BwaMemAligner(..., mesh=...) — mesh execution from the PUBLIC API,
    no env vars, records equal to the default aligner."""
    import os
    import tempfile

    assert os.environ.get("BWAMEM_TPU_FORCE_WAVES") is None
    from bwamem_tpu.api.aligner import BwaMemAligner
    from bwamem_tpu.api.index import BwaMemIndex
    from bwamem_tpu.index.image import write_image

    eng, reads = fixture
    with tempfile.TemporaryDirectory() as d:
        img = os.path.join(d, "t.img")
        write_image(img, eng.idx)
        with BwaMemIndex(img) as ix:
            seqs = ["".join("ACGTN"[c] for c in r).encode()
                    for r in reads[:16]]
            mesh = make_mesh(8, idx_shards=2)
            mesh_al = BwaMemAligner(ix, mesh=mesh)
            ref_al = BwaMemAligner(ix)
            got = mesh_al.align_seqs(seqs)
            want = ref_al.align_seqs(seqs)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert [
                    (a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.n_mismatches,
                     a.aligner_score, a.md_tag, a.xa_tag)
                    for a in g
                ] == [
                    (a.sam_flag, a.ref_id, a.ref_start, a.cigar, a.n_mismatches,
                     a.aligner_score, a.md_tag, a.xa_tag)
                    for a in w
                ]


def test_host_shard_merge_round_trip():
    """Multi-host layer: shards cover the batch exactly, pairs unsplit."""
    reads = list(range(1034))
    seen = []
    for pid in range(4):
        lo, shard = shard_reads_hosts(reads, pid, 4)
        assert lo % 2 == 0 and len(shard) % 2 == 0 or lo + len(shard) == len(reads)
        seen.extend(shard)
    assert seen == reads
