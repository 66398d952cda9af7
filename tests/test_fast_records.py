"""Vectorized BwaMemAlignment assembly == the per-object Aln path.

The fast path (api/aligner._records_fast over the native pipeline's flat
arrays) must produce field-identical records to the oracle route
(align_seqs_raw -> _aln_to_record), across paired/unpaired, mapped/
unmapped, XA-bearing and supplementary records.
"""
import numpy as np
import pytest

from bwamem_tpu import BwaMemAligner, BwaMemIndex, BwaMemPairEndStats
from bwamem_tpu.api.aligner import _aln_to_record
from bwamem_tpu.engine import native_pipeline
from bwamem_tpu.index import image
from bwamem_tpu.index.build import build_index
from bwamem_tpu.utils.fasta import Fasta, FastaContig
from bwamem_tpu.utils.synth import simulate_pairs, synthetic_genome


@pytest.fixture(scope="module")
def img(tmp_path_factory):
    rng = np.random.default_rng(77)
    codes = synthetic_genome(200_000, rng)
    idx = build_index(Fasta([FastaContig("chr", "", codes)]))
    p = tmp_path_factory.mktemp("fastrec") / "ref.img"
    image.write_image(str(p), idx)
    return str(p), codes


def _slow_records(aligner, reads):
    raw = aligner.align_seqs_raw(reads)
    return [[_aln_to_record(p, m) for p, m in per] for per in raw]


@pytest.mark.skipif(not native_pipeline.available(), reason="no native tail")
@pytest.mark.parametrize("paired", [True, False])
def test_fast_equals_slow(img, paired):
    path, codes = img
    rng = np.random.default_rng(99)
    reads = simulate_pairs(codes, rng, 200, read_len=120, isize_mean=300)
    # adversarial extras: junk read (unmapped), N-rich read, chimera
    junk = bytes(rng.integers(65, 91, size=100, dtype=np.uint8))
    nrich = b"ACGT" * 10 + b"N" * 40 + b"ACGT" * 10
    half = 60
    a = reads[0][:half]
    b = reads[3][half : 2 * half]
    reads = list(reads) + [junk, a + b, nrich, reads[1]]
    if paired and len(reads) % 2:
        reads.append(reads[2])
    with BwaMemIndex(path) as index:
        aligner = BwaMemAligner(index)
        if paired:
            aligner.align_pairs()
            aligner.set_proper_pair_end_stats(BwaMemPairEndStats.of(300, 30))
        fast = aligner.align_seqs(reads)
        slow = _slow_records(aligner, reads)
    assert len(fast) == len(slow)
    for i, (f_list, s_list) in enumerate(zip(fast, slow)):
        assert len(f_list) == len(s_list), f"read {i}"
        for f, s in zip(f_list, s_list):
            assert f == s, f"read {i}: {f} != {s}"
