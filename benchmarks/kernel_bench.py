"""TPU kernel micro-benchmarks (single process; run alone on the chip).

Measured on this rig's TPU v5e (2026-08): every call pays a ~40-50ms
loopback-relay round trip which floors all timings (extend scan 65ms vs
pallas 51ms at B=2048 jobs; back-to-back device-side deltas show the
pallas kernel 4-10x faster in pure compute).  On real PCIe-attached TPU
hosts the relay floor disappears.  A freshly killed TPU process poisons
the chip grant for ~5 minutes - run only on a quiet chip.

Reports per-kernel throughput for the two hot ops (SURVEY.md section 3.3):
banded-SW extension (Pallas VMEM kernel vs XLA scan) and batched occ4 rank
queries.  Every timing blocks per iteration — unblocked dispatch through
this rig's relay reports nonsense.

    python benchmarks/kernel_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=3):
    """Times fn including a scalar host pull — on this rig
    block_until_ready resolves early through the relay, so materializing
    a result is the only honest completion barrier."""
    _pull(fn())  # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _pull(fn())
        best = min(best, time.time() - t0)
    return best


def _pull(out):
    if isinstance(out, dict):
        out = next(iter(out.values()))
    elif isinstance(out, (tuple, list)):
        out = out[0]
    return int(np.asarray(out).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from bwamem_tpu.api.options import MemOptions
    from bwamem_tpu.engine.fmindex import FMIndex
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.ops.extend_pallas import ksw_extend_pallas
    from bwamem_tpu.ops.extend_tpu import ksw_extend_batch
    from bwamem_tpu.ops.fmindex_tpu import DeviceFMIndex, occ4
    from bwamem_tpu.utils.fasta import Fasta, FastaContig

    print("devices:", jax.devices(), flush=True)
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}
    opt = MemOptions()
    mat5 = jnp.asarray(np.asarray(opt.mat, dtype=np.int32).reshape(5, 5))
    kw = dict(o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100, max_sc=1)
    rng = np.random.default_rng(0)

    for B, Q, T in [(2048, 128, 256)]:
        qa = jnp.asarray(rng.integers(0, 4, (B, Q)), dtype=jnp.int32)
        ta = jnp.asarray(rng.integers(0, 4, (B, T)), dtype=jnp.int32)
        args = (
            qa, ta, jnp.full(B, Q, jnp.int32), jnp.full(B, T, jnp.int32),
            jnp.full(B, 30, jnp.int32), jnp.full(B, 100, jnp.int32),
            jnp.full(B, 5, jnp.int32), mat5,
        )
        cells = B * Q * T
        dt = timeit(lambda: ksw_extend_batch(*args, **kw))
        print(f"extend scan   B={B}: {dt*1e3:7.1f}ms {cells/dt/1e9:7.2f} GCUPS", flush=True)
        results["extend_scan_ms"] = round(dt * 1e3, 2)
        results["extend_scan_gcups"] = round(cells / dt / 1e9, 3)
        dt = timeit(lambda: ksw_extend_pallas(*args, **kw, b_tile=512))
        print(f"extend pallas B={B}: {dt*1e3:7.1f}ms {cells/dt/1e9:7.2f} GCUPS", flush=True)
        results["extend_pallas_ms"] = round(dt * 1e3, 2)
        results["extend_pallas_gcups"] = round(cells / dt / 1e9, 3)

    # occ4 batched rank queries over a 1 Mbp index
    codes = rng.integers(0, 4, 1_000_000).astype(np.uint8)
    fm = FMIndex(build_index(Fasta([FastaContig("c", "", codes)])))
    dfm = DeviceFMIndex.from_host(fm)
    for NQ in (1 << 14, 1 << 17):
        ks = jnp.asarray(
            rng.integers(0, fm.seq_len, NQ).astype(np.int32)
        )
        dt = timeit(lambda: occ4(dfm, ks))
        print(f"occ4 N={NQ}: {dt*1e3:7.2f}ms {NQ/dt/1e6:7.1f} Mquery/s", flush=True)
        results[f"occ4_{NQ}_ms"] = round(dt * 1e3, 3)
        results[f"occ4_{NQ}_mquery_s"] = round(NQ / dt / 1e6, 2)

    # full bwt_smem1a device seeding (one round-1 wave, 150bp reads)
    from bwamem_tpu.ops.smem_tpu import smem1a_batch
    B2, L2v = 1024, 150
    reads = np.empty((B2, L2v), dtype=np.int32)
    for i in range(B2):
        s0 = int(rng.integers(0, 1_000_000 - L2v))
        reads[i] = codes[s0 : s0 + L2v]
    qs = jnp.asarray(reads)
    qls = jnp.full(B2, L2v, jnp.int32)
    xs = jnp.zeros(B2, jnp.int32)
    mi = jnp.ones(B2, jnp.int32)
    dt = timeit(lambda: smem1a_batch(dfm, qs, qls, xs, mi))
    print(f"smem1a wave B={B2}: {dt*1e3:7.1f}ms {B2/dt:7.0f} starts/s", flush=True)
    results["smem1a_wave_ms"] = round(dt * 1e3, 2)
    results["smem1a_starts_per_s"] = round(B2 / dt, 1)

    if "--json" in sys.argv:
        import json
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as fh:
            json.dump(results, fh)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
