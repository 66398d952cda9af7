"""Microprobes of Mosaic/VPU op costs on the real chip (run alone).

Measures per-op device time for the operation classes the banded-SW
extension kernel is built from, so kernel-layout decisions are driven by
the hardware instead of guesses:

  * wide32 / wide16 — [B,128] elementwise int32 vs int16 (packing rate)
  * scal32          — [B,1] elementwise (carry/bookkeeping cost)
  * reduce          — [B,128] -> [B,1] lane max-reduction
  * roll            — pltpu.roll along lanes
  * sub-roll        — roll along sublanes ([128,B] layout probe)

Method: K dependent iterations inside one kernel-internal fori_loop; device
time per iteration from the t(K_big)-t(K_small) slope (same relay-amortising
scheme as device_time.py).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512


def timed(make, k_small=2048, k_big=16384, reps=3):
    run_s, run_b = make(k_small), make(k_big)
    np.asarray(run_s())
    np.asarray(run_b())
    bs = bb = float("inf")
    for _ in range(reps):
        t0 = time.time(); np.asarray(run_s()); bs = min(bs, time.time() - t0)
        t0 = time.time(); np.asarray(run_b()); bb = min(bb, time.time() - t0)
    return (bb - bs) / (k_big - k_small)


def probe(name, body_fn, shape, dtype, per_iter_ops, k_small=2048, k_big=16384):
    def kernel(x_ref, o_ref, *, K):
        def step(_, v):
            return body_fn(v)
        o_ref[...] = jax.lax.fori_loop(0, K, step, x_ref[...])

    def make(K):
        x = jnp.ones(shape, dtype)
        f = pl.pallas_call(
            partial(kernel, K=K),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )
        return jax.jit(lambda: f(x)).lower().compile()

    dt = timed(make, k_small, k_big)
    ns_per_op = dt / per_iter_ops * 1e9
    print(f"{name:10s} {dt*1e6:9.3f} us/iter  {ns_per_op:8.2f} ns/op", flush=True)
    return ns_per_op


def main():
    print("devices:", jax.devices(), flush=True)

    def adds(n):
        def body(v):
            for _ in range(n):
                v = v + v
            return v
        return body

    probe("wide32", adds(32), (B, 128), jnp.int32, 32)
    probe("wide16", adds(32), (B, 128), jnp.int16, 32)
    probe("scal32", adds(32), (B, 1), jnp.int32, 32)
    probe("row32", adds(32), (8, 128), jnp.int32, 32)

    def reduce_body(v):
        m = jnp.max(v, axis=1, keepdims=True)
        return v + m

    probe("reduce", reduce_body, (B, 128), jnp.int32, 1)

    def roll_body(v):
        for _ in range(8):
            v = pltpu.roll(v, shift=1, axis=1) + 1
        return v

    probe("roll-lane", roll_body, (B, 128), jnp.int32, 8)

    def roll0_body(v):
        for _ in range(8):
            v = pltpu.roll(v, shift=1, axis=0) + 1
        return v

    probe("roll-sub", roll0_body, (128, B), jnp.int32, 8)

    def reduce0_body(v):
        m = jnp.max(v, axis=0, keepdims=True)
        return v + m

    probe("reduce-sub", reduce0_body, (128, B), jnp.int32, 1)

    def prefmax_body(v):
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        P = v
        k = 1
        while k < 128:
            s = pltpu.roll(P, shift=k, axis=1)
            P = jnp.maximum(P, jnp.where(col >= k, s, -(1 << 30)))
            k <<= 1
        return P

    probe("prefmax", prefmax_body, (B, 128), jnp.int32, 1)


if __name__ == "__main__":
    main()
