"""Probe random-gather strategies for the occ-line primitive on the v5e.

The occ4 rank query ([EXT] bwt.c hot loop #1) is one random line read per
query.  r03 measured the XLA two-gather formulation (separate ckpt[idx] +
words[idx] gathers) at 1.5% of HBM peak; a first probe pass showed a
single fused-line gather is ~23x faster and that XLA's gather cost is
per-ROW, not per-byte (512B rows gather at the same row rate as 64B rows,
i.e. 43% of HBM).  Pallas formulations are out: a VMEM dynamic-slice
kernel faults the TPU worker on this toolchain and per-line DMA rings
fail to compile.

This pass maps the row-rate surface: row width W in {8,16,32,64,128} u32
x table size {1 MB, 64 MB, 1 GB} x query count, with the relay-amortized
fori_loop slope method (benchmarks/device_time.py).  The result picks the
fused-line span for DeviceFMIndex (ops/fmindex_tpu.py).

Tables are synthesized ON DEVICE (iota hash) — this rig's host<->device
relay is ~MB/s, so host-built GB tables can never cross it.

    python benchmarks/gather_probe.py [--json PATH]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BYTES_S = 819e9


def _pull(x):
    return int(np.asarray(x).ravel()[0])


def slope_time(make_run, k_small, k_big, reps=3):
    run_s, run_b = make_run(k_small), make_run(k_big)
    _pull(run_s())
    _pull(run_b())
    best_s = best_b = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _pull(run_s())
        best_s = min(best_s, time.time() - t0)
        t0 = time.time()
        _pull(run_b())
        best_b = min(best_b, time.time() - t0)
    return (best_b - best_s) / (k_big - k_small)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = {"platform": jax.devices()[0].platform}

    def loop_of(fn, idx):
        """fn(idx)->[N,...] gather; chained via opaque zero perturbation."""
        def make(K):
            @jax.jit
            def run():
                def body(_, c):
                    out = fn(idx + jnp.minimum(c, 0))
                    return c + out.reshape(-1)[0].astype(jnp.int32)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    def report(name, dt, nq, bytes_per_row):
        qps = nq / dt
        eff = qps * bytes_per_row / HBM_BYTES_S
        results[f"{name}_mrow_s"] = round(qps / 1e6, 2)
        results[f"{name}_hbm_frac"] = round(eff, 4)
        print(f"{name:28s}: {dt*1e3:9.4f} ms  {qps/1e6:9.1f} Mrow/s"
              f"  {eff*100:6.2f}% HBM", flush=True)

    def synth(nb, W):
        def mk():
            i = jax.lax.broadcasted_iota(jnp.uint32, (nb, W), 0)
            j = jax.lax.broadcasted_iota(jnp.uint32, (nb, W), 1)
            return i * jnp.uint32(2654435761) ^ (j * jnp.uint32(40503) + 1)
        t = jax.jit(mk)()
        t.block_until_ready()
        return t

    NQ = 1 << 17
    for mb, ws in ((1, (16,)), (64, (8, 16, 32, 128)), (1024, (16,))):
        for W in ws:
            nb = (mb << 20) // (4 * W)
            tab = synth(nb, W)
            idx = jnp.asarray(rng.integers(0, nb, NQ).astype(np.int32))
            dt = slope_time(loop_of(lambda i, t=tab: t[i], idx), 4, 32)
            report(f"tab{mb}MB_w{W}_nq{NQ}", dt, NQ, 4 * W)
            del tab

    # query-count scaling at 64 MB, W=16: per-TICK fixed latency vs
    # streaming rate (the lockstep-loop design constant)
    W = 16
    nb = (64 << 20) // (4 * W)
    tab = synth(nb, W)
    for lg in (10, 12, 14, 17, 20):
        nq = 1 << lg
        idx = jnp.asarray(rng.integers(0, nb, nq).astype(np.int32))
        dt = slope_time(loop_of(lambda i, t=tab: t[i], idx), 4, 32)
        report(f"tab64MB_w16_nq{nq}", dt, nq, 4 * W)

    # sorted-index locality ceiling at 1 GB, W=16
    del tab
    nb = (1024 << 20) // (4 * W)
    tab = synth(nb, W)
    idx_np = np.sort(rng.integers(0, nb, NQ).astype(np.int32))
    dt = slope_time(
        loop_of(lambda i, t=tab: jnp.take(t, i, axis=0,
                                          indices_are_sorted=True),
                jnp.asarray(idx_np)), 4, 32)
    report(f"tab1024MB_w16_sorted_nq{NQ}", dt, NQ, 4 * W)

    if "--json" in sys.argv:
        import json
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as fh:
            json.dump(results, fh, indent=1)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
