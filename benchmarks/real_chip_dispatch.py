"""Real-chip dispatch-cost anchor for the scaling model.

MULTICHIP_SCALING's dispatch-cost fit t(n,B) = F(n) + B*v_eff(n) comes
from the CPU-mesh proxy; this script measures the SAME extension-wave
computation on the attached TPU at several batch sizes and splits, per
batch size:

  * wall_ms      — one-shot dispatch wall time (host->device upload +
                   dispatch + compute + pull; on this rig the upload rides
                   the loopback relay, so wall includes a relay term a
                   PCIe/ICI host would not pay),
  * device_ms    — chained fori_loop slope (pure device compute),
  * overhead_ms  = wall - device: the measured per-dispatch fixed cost F
                   on real hardware.

Run alone on a quiet chip:  python benchmarks/real_chip_dispatch.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bwamem_tpu.api.options import MemOptions
    from bwamem_tpu.ops.extend_tpu import ksw_extend_batch

    out_path = sys.argv[1] if len(sys.argv) > 1 else "REAL_CHIP_DISPATCH.json"
    devs = jax.devices()
    opt = MemOptions()
    mat = jnp.asarray(np.asarray(opt.mat, np.int32).reshape(5, 5))
    rng = np.random.default_rng(0)
    Q, T = 128, 256
    pts = []
    for B in (256, 1024, 4096):
        qs = rng.integers(0, 4, (B, Q)).astype(np.int32)
        ts = np.concatenate(
            [qs, rng.integers(0, 4, (B, T - Q)).astype(np.int32)], axis=1
        )
        muts = rng.random(ts.shape) < 0.01
        ts = np.where(muts, (ts + 1) % 4, ts)
        qlen = np.full(B, Q, np.int32)
        tlen = np.full(B, T, np.int32)
        h0 = np.full(B, 30, np.int32)
        w = np.full(B, 100, np.int32)
        bon = np.full(B, 5, np.int32)

        def one_shot():
            out = ksw_extend_batch(
                jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlen),
                jnp.asarray(tlen), jnp.asarray(h0), jnp.asarray(w),
                jnp.asarray(bon), mat, opt.o_del, opt.e_del, opt.o_ins,
                opt.e_ins, opt.zdrop, int(max(opt.mat)),
            )
            return int(np.asarray(out["score"])[0])

        one_shot()  # compile
        wall = float("inf")
        for _ in range(5):
            t0 = time.time()
            one_shot()
            wall = min(wall, time.time() - t0)

        # chained device-time slope
        qs_d, ts_d = jnp.asarray(qs), jnp.asarray(ts)
        args_d = tuple(
            jnp.asarray(x) for x in (qlen, tlen, h0, w, bon)
        )

        def make_run(K):
            @jax.jit
            def run():
                def body(_, c):
                    out = ksw_extend_batch(
                        qs_d + jnp.minimum(c, 0), ts_d, *args_d, mat,
                        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                        opt.zdrop, int(max(opt.mat)),
                    )
                    return jnp.abs(out["score"].sum()) % 1021
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        r1, r5 = make_run(1), make_run(5)
        int(np.asarray(r1())); int(np.asarray(r5()))
        b1 = b5 = float("inf")
        for _ in range(3):
            t0 = time.time(); int(np.asarray(r1())); b1 = min(b1, time.time() - t0)
            t0 = time.time(); int(np.asarray(r5())); b5 = min(b5, time.time() - t0)
        dev = (b5 - b1) / 4
        pts.append({
            "batch": B,
            "wall_ms": round(wall * 1e3, 2),
            "device_ms": round(dev * 1e3, 2),
            "overhead_ms": round((wall - dev) * 1e3, 2),
            "upload_bytes": int(qs.nbytes + ts.nbytes + 5 * qlen.nbytes),
        })
        print(pts[-1], flush=True)
    rec = {
        "metric": "real_chip_dispatch_cost",
        "platform": devs[0].platform,
        "device": str(devs[0]),
        "kernel": "ksw_extend_batch scan, Q=128 T=256",
        "points": pts,
        "note": "overhead_ms = measured per-dispatch fixed cost F on real "
        "hardware (includes this rig's loopback-relay upload; a PCIe/ICI "
        "host pays DMA instead). Anchors the CPU-proxy scaling model's "
        "F(n) with a hardware point.",
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
