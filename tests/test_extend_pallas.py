"""Pallas extension kernel vs the XLA-scan kernel (interpret mode on CPU;
the on-device equivalence + 4-10x speedup is checked on real TPU hardware
in bench/kernel scripts)."""
import numpy as np
import jax.numpy as jnp

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.ops.extend_pallas import ksw_extend_pallas
from bwamem_tpu.ops.extend_tpu import ksw_extend_batch


def test_pallas_matches_scan_kernel():
    opt = MemOptions()
    mat5 = jnp.asarray(np.asarray(opt.mat, dtype=np.int32).reshape(5, 5))
    kw = dict(o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100, max_sc=1)
    B, Q, T = 128, 128, 160
    rng = np.random.default_rng(0)
    qa = jnp.asarray(rng.integers(0, 4, (B, Q)), dtype=jnp.int32)
    ta = jnp.asarray(rng.integers(0, 4, (B, T)), dtype=jnp.int32)
    qlen = jnp.asarray(rng.integers(1, Q + 1, B), dtype=jnp.int32)
    tlen = jnp.asarray(rng.integers(1, T + 1, B), dtype=jnp.int32)
    h0 = jnp.asarray(rng.integers(1, 60, B), dtype=jnp.int32)
    ws = jnp.asarray(rng.choice([3, 10, 100, 400], B), dtype=jnp.int32)
    bon = jnp.asarray(rng.choice([0, 5], B), dtype=jnp.int32)
    ref = ksw_extend_batch(qa, ta, qlen, tlen, h0, ws, bon, mat5, **kw)
    got = ksw_extend_pallas(
        qa, ta, qlen, tlen, h0, ws, bon, mat5, **kw, interpret=True, b_tile=128
    )
    for k in ref:
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_pallas_ragged_shapes():
    """Non-aligned B/Q/T exercise the wrapper's lane/sublane padding."""
    opt = MemOptions()
    mat5 = jnp.asarray(np.asarray(opt.mat, dtype=np.int32).reshape(5, 5))
    kw = dict(o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100, max_sc=1)
    rng = np.random.default_rng(1)
    B, Q, T = 37, 61, 93
    qa = jnp.asarray(rng.integers(0, 4, (B, Q)), dtype=jnp.int32)
    ta = jnp.asarray(rng.integers(0, 4, (B, T)), dtype=jnp.int32)
    qlen = jnp.asarray(rng.integers(1, Q + 1, B), dtype=jnp.int32)
    tlen = jnp.asarray(rng.integers(1, T + 1, B), dtype=jnp.int32)
    h0 = jnp.asarray(rng.integers(1, 60, B), dtype=jnp.int32)
    ws = jnp.asarray(rng.choice([3, 10, 100], B), dtype=jnp.int32)
    bon = jnp.asarray(rng.choice([0, 5], B), dtype=jnp.int32)
    ref = ksw_extend_batch(qa, ta, qlen, tlen, h0, ws, bon, mat5, **kw)
    got = ksw_extend_pallas(
        qa, ta, qlen, tlen, h0, ws, bon, mat5, **kw, interpret=True
    )
    for k in ref:
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_wave_entry_routes_pallas(monkeypatch):
    """ksw_extend_batch_np with BWAMEM_TPU_EXTEND_KERNEL=pallas matches the
    forced-scan route (the env switch the device-extend pipeline rides)."""
    from bwamem_tpu.ops.extend_tpu import ksw_extend_batch_np

    opt = MemOptions()
    rng = np.random.default_rng(2)
    jobs_q = [rng.integers(0, 4, rng.integers(5, 40)).astype(np.uint8)
              for _ in range(9)]
    jobs_t = [rng.integers(0, 4, rng.integers(5, 60)).astype(np.uint8)
              for _ in range(9)]
    params = (opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop)
    h0s = list(rng.integers(1, 40, 9))
    ws = [100] * 9
    bons = [0, 5, 0, 5, 0, 5, 0, 5, 0]
    monkeypatch.setenv("BWAMEM_TPU_EXTEND_KERNEL", "scan")
    ref = ksw_extend_batch_np(jobs_q, jobs_t, opt.mat, params, h0s, ws, bons)
    monkeypatch.setenv("BWAMEM_TPU_EXTEND_KERNEL", "pallas")
    got = ksw_extend_batch_np(jobs_q, jobs_t, opt.mat, params, h0s, ws, bons)
    assert ref == got
