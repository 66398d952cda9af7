"""Host<->device link probe: decide device-kernel routing defaults.

The engine's big extension waves can run on the TPU kernel
(BWAMEM_TPU_DEVICE_EXTEND) — a clear win on PCIe/ICI-attached hosts and a
clear loss when the device sits behind a slow relay (some dev rigs tunnel
the chip at ~MB/s).  When the env var is UNSET, the first large wave
triggers a one-time ~2 MB round-trip probe; the device path is enabled iff
the measured bandwidth clears BWAMEM_TPU_LINK_MIN_MBPS (default 200 MB/s —
an order of magnitude under PCIe gen3, an order of magnitude over the
relay).  Explicit "1"/"0" always win; the probe result is cached for the
process.

This is the runtime analog of the reference's native-library resolution
policy (load the fast path where the platform supports it, fall back
otherwise — BwaMemIndex.java:434-477).
"""
from __future__ import annotations

import os
import time

_verdict: bool | None = None


_NO_BACKEND = "no-backend"


def _probe() -> bool | str:
    try:
        import sys

        # Never let the auto-path be the FIRST thing to initialize JAX: on
        # exclusive-grant rigs (one chip per process) jax.devices() in a
        # host-path process would acquire — or block on — the chip.  Probe
        # only when this process already runs a JAX backend (mesh /
        # device-seed / explicitly device-routed callers).  This outcome is
        # NOT cached as a verdict: a backend may come up later.
        jax_mod = sys.modules.get("jax")
        if jax_mod is None:
            return _NO_BACKEND
        from jax._src import xla_bridge as _xb

        if not getattr(_xb, "_backends", None):
            return _NO_BACKEND
        import jax
        import numpy as np

        accels = [d for d in jax.devices() if d.platform != "cpu"]
        if not accels:
            return False
        buf = np.zeros(1 << 20, dtype=np.uint8)  # 1 MB each way
        # warm the dispatch path so we time the link, not device init
        w = jax.device_put(buf[:1024], accels[0])
        w.block_until_ready()
        np.asarray(w)
        t0 = time.perf_counter()
        dev = jax.device_put(buf, accels[0])
        dev.block_until_ready()
        np.asarray(dev)
        dt = max(time.perf_counter() - t0, 1e-9)
        mbps = 2.0 / dt
        floor = float(os.environ.get("BWAMEM_TPU_LINK_MIN_MBPS", "200"))
        return mbps >= floor
    except Exception:
        return False


def device_extend_auto() -> bool:
    """Probe-once verdict for routing large waves to the device kernel.

    The 'JAX backend not initialized yet' outcome is transient and never
    cached — the probe re-runs once a backend exists, so an early host-path
    wave can't permanently disable device routing.
    """
    global _verdict
    if _verdict is None:
        r = _probe()
        if r == _NO_BACKEND:
            return False
        _verdict = bool(r)
    return _verdict
