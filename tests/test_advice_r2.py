"""Regression tests for the round-2 advisor findings (ADVICE.md r2):

1. chains_device_batch must fall back to the host oracle for gigabase
   references (2*l_pac >= 2^31) instead of staging int32-wrapped rbegs.
2. native_pipeline_ok must disengage when any documented device-stage
   switch (SEED / CHAIN / SA_LOOKUP) is set, so public-API callers who set
   only those flags actually get the device kernels.
"""
import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.api.options import MemOptions
from bwamem_tpu.engine.pipeline import Engine, native_pipeline_ok
from bwamem_tpu.engine.seed import SmemIntv
from bwamem_tpu.index import bwtfile


@pytest.fixture(scope="module")
def rota_eng():
    return Engine(bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))


class _HugeBns:
    """Proxy bns reporting a gigabase l_pac; contig table stays real."""

    def __init__(self, bns):
        self._bns = bns
        self.l_pac = 1 << 31  # 2*l_pac overflows int32
        self.anns = bns.anns

    def intv_to_rid(self, rb, re):
        return self._bns.intv_to_rid(rb, re)


def test_chains_device_batch_gigabase_fallback(rota_eng, monkeypatch):
    from bwamem_tpu.ops import chain_tpu

    opt = MemOptions()
    rng = np.random.default_rng(7)
    read = rng.integers(0, 4, 100).astype(np.uint8)
    intervals = [SmemIntv(x0=0, x1=0, s=1, qb=0, qe=60)]
    rbegs = [np.asarray([100], dtype=np.int64)]

    def boom(*a, **k):
        raise AssertionError("device kernel must not run at gigabase scale")

    monkeypatch.setattr(chain_tpu, "chain_kernel", boom)
    bns = _HugeBns(rota_eng.idx.bns)
    out = chain_tpu.chains_device_batch(
        opt, rota_eng.fm, bns, [read], [intervals], [rbegs]
    )
    assert len(out) == 1
    assert out[0] and out[0][0].seeds[0].rbeg == 100


def test_native_pipeline_ok_respects_device_switches(rota_eng, monkeypatch):
    from bwamem_tpu.engine import native_fm, native_pipeline

    if not (native_fm.available() and native_pipeline.available()):
        pytest.skip("native libs unavailable")
    reads = [np.zeros(50, np.uint8)]
    assert native_pipeline_ok(rota_eng, reads)
    for var in (
        "BWAMEM_TPU_DEVICE_SEED",
        "BWAMEM_TPU_DEVICE_CHAIN",
        "BWAMEM_TPU_DEVICE_SA_LOOKUP",
    ):
        monkeypatch.setenv(var, "1")
        assert not native_pipeline_ok(rota_eng, reads), var
        monkeypatch.delenv(var)
