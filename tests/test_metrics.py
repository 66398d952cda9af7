"""Structured metrics / observability surface (SURVEY.md section 5)."""
import json
import os

import numpy as np

from conftest import REFERENCE_RESOURCES

import bwamem_tpu
from bwamem_tpu import BwaMemAligner, BwaMemIndex
from bwamem_tpu.index import bwtfile, image
from bwamem_tpu.utils import metrics


def test_counters_and_snapshot(tmp_path):
    img = str(tmp_path / "m.img")
    image.write_image(img, bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))
    metrics.reset()
    idx = BwaMemIndex(img)
    try:
        al = BwaMemAligner(idx)
        al.align_seqs([
            b"GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"
        ])
        snap = bwamem_tpu.metrics()
        assert snap["counters"]["batches"] == 1
        assert snap["counters"]["reads"] == 1
        assert snap["counters"]["records"] >= 1
        assert isinstance(snap["stage_seconds"], dict)
        json.dumps(snap)  # JSON-able
    finally:
        idx.close()


def test_metrics_dump_sink(tmp_path, monkeypatch):
    img = str(tmp_path / "m.img")
    image.write_image(img, bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa"))
    sink = str(tmp_path / "metrics.json")
    monkeypatch.setenv("BWAMEM_TPU_METRICS", sink)
    idx = BwaMemIndex(img)
    try:
        BwaMemAligner(idx).align_seqs([b"ACGTACGTACGTACGTACGTACGTACGTACGTACGT"])
    finally:
        idx.close()
    payload = json.loads(open(sink).read())
    assert "counters" in payload and "stage_seconds" in payload
