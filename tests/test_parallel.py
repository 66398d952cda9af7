"""Parallel layer: mesh construction, dp extension step, distributed
shard/merge, stage timers."""
import numpy as np
import pytest
import jax

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.parallel.mesh import make_mesh
from bwamem_tpu.parallel.dataparallel import (
    make_dp_extend_step,
    shard_extension_args,
)
from bwamem_tpu.parallel.distributed import merge_shards, shard_bounds
from bwamem_tpu.utils.timers import StageTimers


def test_make_mesh_shapes():
    m = make_mesh(8, idx_shards=2)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 4, "idx": 2}
    m = make_mesh(8)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 8, "idx": 1}
    with pytest.raises(ValueError):
        make_mesh(8, idx_shards=3)


def test_dp_extension_step_matches_single_device():
    from bwamem_tpu.ops.extend_tpu import ksw_extend_batch
    import jax.numpy as jnp

    opt = MemOptions()
    mesh = make_mesh(8, idx_shards=2)
    mat5 = jnp.asarray(np.asarray(opt.mat, dtype=np.int32).reshape(5, 5))
    B, Q, T = 64, 32, 48
    rng = np.random.default_rng(0)
    raw = dict(
        qseq=rng.integers(0, 4, (B, Q)).astype(np.int32),
        tseq=rng.integers(0, 4, (B, T)).astype(np.int32),
        qlen=np.full(B, Q, np.int32),
        tlen=np.full(B, T, np.int32),
        h0=np.full(B, 19, np.int32),
        w=np.full(B, 100, np.int32),
        end_bonus=np.full(B, 5, np.int32),
    )
    sharded = shard_extension_args(mesh, raw)
    sharded["mat"] = mat5
    step = make_dp_extend_step(mesh, 6, 1, 6, 1, 100, 1)
    out = step(**sharded)
    ref = ksw_extend_batch(
        *(jnp.asarray(raw[k]) for k in
          ("qseq", "tseq", "qlen", "tlen", "h0", "w", "end_bonus")),
        mat5, 6, 1, 6, 1, 100, 1,
    )
    for k in ref:
        assert np.array_equal(np.asarray(out[k]), np.asarray(ref[k])), k


def test_shard_bounds_and_merge():
    n = 103
    shards = []
    for pid in range(4):
        lo, hi = shard_bounds(n, pid, 4)
        shards.append((lo, [f"r{i}" for i in range(lo, hi)]))
    los = [s[0] for s in shards]
    assert los[0] == 0 and all(b >= a for a, b in zip(los, los[1:]))
    merged = merge_shards(shards, n)
    assert merged == [f"r{i}" for i in range(n)]
    with pytest.raises(RuntimeError):
        merge_shards(shards[:-1], n)


def test_stage_timers_populated():
    from bwamem_tpu.engine.pipeline import Engine, align_regs_batch
    from bwamem_tpu.index import bwtfile
    from bwamem_tpu.utils.timers import TIMERS

    eng = Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))
    TIMERS.reset()
    fwd = eng.idx.get_seq(0, eng.idx.bns.l_pac)
    align_regs_batch(MemOptions(), eng, [fwd[0:70].copy(), fwd[100:170].copy()])
    snap = TIMERS.snapshot()
    for stage in ("seed", "sa_lookup", "dedup"):
        assert stage in snap
    # fused native core reports chain+extend as one stage; staged paths
    # report them separately
    assert ("chain+extend" in snap) or ("chain" in snap and "extend" in snap)
    assert "seed" in TIMERS.report()
