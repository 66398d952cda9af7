"""BWAMEM_TPU_WAVE_TAIL=1 (coroutine wave extension in the native tail)
must be record-identical to the sequential driver: same coroutine body,
different scheduler (align_core.cpp chains2aln_wave vs chains2aln)."""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from bwamem_tpu.engine import native_pipeline


@pytest.mark.skipif(not native_pipeline.available(),
                    reason="native tail unavailable")
def test_wave_tail_record_equal(tmp_path):
    script = textwrap.dedent(
        """
        import json, os, sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from bwamem_tpu.index.build import build_index
        from bwamem_tpu.utils.fasta import Fasta, FastaContig
        from bwamem_tpu.utils.synth import simulate_pairs, synthetic_genome
        from bwamem_tpu.index import image
        from bwamem_tpu.api import (BwaMemAligner, BwaMemIndex,
                                    BwaMemPairEndStats)

        img = sys.argv[1]
        if not os.path.exists(img):
            rng = np.random.default_rng(5)
            codes = synthetic_genome(800_000, rng)
            idx = build_index(Fasta([FastaContig("c", "", codes)]))
            image.write_image(img, idx)
        codes = synthetic_genome(800_000, np.random.default_rng(5))
        reads = simulate_pairs(codes, np.random.default_rng(6), 400)
        index = BwaMemIndex(img)
        a = BwaMemAligner(index)
        a.align_pairs()
        a.set_proper_pair_end_stats(BwaMemPairEndStats.of(350, 35))
        out = a.align_seqs(reads)
        res = [[(r.sam_flag, r.ref_id, r.ref_start, r.cigar,
                 r.n_mismatches, r.aligner_score, r.mate_ref_start,
                 r.template_len, r.md_tag, r.xa_tag) for r in recs]
               for recs in out]
        index.close()
        print(json.dumps(res))
        """
    )
    img = str(tmp_path / "eq.img")
    outs = {}
    for mode in ("0", "1"):
        env = dict(os.environ, BWAMEM_TPU_WAVE_TAIL=mode)
        r = subprocess.run(
            [sys.executable, "-c", script, img], capture_output=True,
            text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        outs[mode] = r.stdout.strip().splitlines()[-1]
    assert outs["0"] == outs["1"]
