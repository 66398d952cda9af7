"""Device-link auto-routing policy (utils/devlink.py)."""
import numpy as np

from bwamem_tpu.engine.extend_batch import HOST_FALLBACK_JOBS
from bwamem_tpu.utils import devlink


def test_auto_is_off_without_accelerator():
    # conftest forces the CPU platform: no accelerator -> host routing
    import jax

    jax.devices()  # bring a backend up so the probe yields a real verdict
    devlink._verdict = None
    assert devlink.device_extend_auto() is False
    assert devlink._verdict is False  # cached


def test_no_backend_outcome_is_not_cached(monkeypatch):
    """ADVICE r2: a probe before any JAX backend exists must not poison
    the verdict cache for the rest of the process."""
    devlink._verdict = None
    monkeypatch.setattr(devlink, "_probe", lambda: devlink._NO_BACKEND)
    assert devlink.device_extend_auto() is False
    assert devlink._verdict is None  # transient, not cached
    monkeypatch.setattr(devlink, "_probe", lambda: True)
    assert devlink.device_extend_auto() is True  # re-probed later
    devlink._verdict = None


def test_explicit_env_overrides_auto(monkeypatch):
    """BWAMEM_TPU_DEVICE_EXTEND=0/1 short-circuits the probe entirely."""
    from bwamem_tpu.engine import extend_batch

    calls = []
    monkeypatch.setattr(
        devlink, "device_extend_auto", lambda: calls.append(1) or True
    )
    monkeypatch.setenv("BWAMEM_TPU_DEVICE_EXTEND", "0")
    # a wave large enough to qualify must still stay on host with "0"
    from bwamem_tpu.api.options import MemOptions

    opt = MemOptions()
    q = np.ones(30, np.uint8)
    t = np.ones(40, np.uint8)
    jobs = [(q, t)] * max(HOST_FALLBACK_JOBS, 4)
    out = extend_batch._run_kernel(
        opt, jobs, [0] * len(jobs), [100] * len(jobs), [30] * len(jobs)
    )
    assert len(out) == len(jobs)
    assert not calls  # probe never consulted when env is explicit
