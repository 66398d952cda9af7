"""Structured metrics + device tracing (SURVEY.md section 5).

The reference has no observability (it silences the engine,
``bwa_verbose = 0`` at jnibwa.c:163).  Here:

  * counters — reads aligned, records emitted, batches, device waves —
    accumulate process-wide alongside the per-stage timers
    (utils/timers.py) and are queryable as one JSON-able snapshot via
    :func:`snapshot` (surfaced as ``bwamem_tpu.metrics()``);
  * ``BWAMEM_TPU_METRICS=<path|->`` dumps the snapshot after every
    ``align_seqs`` batch (``-`` = stderr) — a scrape surface for
    production monitoring;
  * ``BWAMEM_TPU_TRACE=<dir>`` wraps each ``align_seqs`` batch in
    ``jax.profiler.trace`` so the device kernels (extension waves, occ
    gathers, SMEM lanes) show up in TensorBoard/Perfetto.
"""
from __future__ import annotations

import json
import os
import sys
import threading
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

from .timers import TIMERS

_lock = threading.Lock()
_counters: Dict[str, int] = defaultdict(int)


def count(name: str, n: int = 1) -> None:
    with _lock:
        _counters[name] += n


def snapshot() -> Dict:
    """One JSON-able view: counters + per-stage wall times."""
    with _lock:
        counters = dict(_counters)
    return {
        "counters": counters,
        "stage_seconds": {k: round(v, 6) for k, v in TIMERS.totals.items()},
        "stage_calls": dict(TIMERS.counts),
    }


def reset() -> None:
    with _lock:
        _counters.clear()
    TIMERS.reset()


def _dump(sink: str) -> None:
    payload = json.dumps(snapshot())
    if sink == "-":
        print(payload, file=sys.stderr)
    else:
        with open(sink, "w") as fh:
            fh.write(payload + "\n")


@contextmanager
def batch_scope():
    """Wraps one align_seqs batch: optional jax.profiler trace + metrics
    dump, both gated on env so the default path stays zero-overhead."""
    trace_dir = os.environ.get("BWAMEM_TPU_TRACE")
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
    sink = os.environ.get("BWAMEM_TPU_METRICS")
    if sink:
        _dump(sink)
