"""Concurrency contract tests.

The reference's model (SURVEY.md section 5): index is thread-safe via
ref-count; aligners are cheap and per-thread.  Same here — plus our native
calls release the GIL, so threads genuinely overlap in the C++ stages.
"""
import threading

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu import BwaMemAligner, BwaMemIndex

READ_L1 = b"GGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT"


@pytest.fixture()
def index(tmp_path):
    img = str(tmp_path / "ref.img")
    BwaMemIndex.create_index_image_from_index_files(
        f"{REFERENCE_RESOURCES}/ref.fa", img
    )
    idx = BwaMemIndex(img)
    yield idx
    if idx.is_open():
        idx.close()


def test_one_aligner_per_thread(index):
    results = {}
    errors = []

    def worker(tid):
        try:
            with BwaMemAligner(index) as aligner:
                for _ in range(5):
                    r = aligner.align_seqs([READ_L1])
                    assert r[0][0].ref_start == 0
            results[tid] = True
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 8


def test_close_races_with_alignment(index):
    """close() must refuse while any aligner holds a reference, and succeed
    once all are done — never corrupt state."""
    barrier = threading.Barrier(2)
    refused = []

    def aligner_thread():
        a = BwaMemAligner(index)
        index.ref_index()
        barrier.wait()
        # hold the ref while main thread attempts close
        barrier.wait()
        index.de_ref_index()
        a.close()

    t = threading.Thread(target=aligner_thread)
    t.start()
    barrier.wait()
    with pytest.raises(RuntimeError):
        index.close()
    refused.append(True)
    barrier.wait()
    t.join()
    index.close()
    assert not index.is_open()
    with pytest.raises(RuntimeError):
        BwaMemAligner(index)
