"""Byte-level SAM snapshot on the reference's rotavirus fixture.

test_api_golden pins the record FIELDS to the reference's golden values
(BwaMemIndexTest.java:45-82); this pins the rendered SAM TEXT — column
order, tag set/order, MD/NM rendering, mapq — so formatting regressions
in api/sam.py or the CLI cannot pass silently."""
import os
import subprocess
import sys

import pytest

from conftest import REFERENCE_RESOURCES


@pytest.fixture(scope="module")
def golden_fastq(tmp_path_factory):
    d = tmp_path_factory.mktemp("samsnap")
    ref = open(f"{REFERENCE_RESOURCES}/ref.fa").read().splitlines()
    seq = "".join(ref[1:])
    import shutil

    shutil.copy(f"{REFERENCE_RESOURCES}/ref.fa", d / "ref.fa")
    r1 = seq[:70]
    snv = list(r1)
    snv[9], snv[29], snv[59] = "A", "C", "G"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(seq[100:170]))
    dele = seq[70:102] + seq[104:140]
    with open(d / "reads.fq", "w") as f:
        for i, s in enumerate((r1, "".join(snv), rc, dele)):
            f.write(f"@g{i}\n{s}\n+\n{'I' * len(s)}\n")
    return d


EXPECTED = [
    "g0\t0\trotavirus\t1\t60\t70M\t*\t0\t0\tGGCTTTTAATGCTTTTCAGTGGTTGCTGCTCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT\t{q70}\tNM:i:0\tMD:Z:70\tAS:i:70\tXS:i:0",
    "g1\t0\trotavirus\t1\t60\t70M\t*\t0\t0\tGGCTTTTAAAGCTTTTCAGTGGTTGCTGCCCAAGATGGAGTCTACTCAGCAGATGGTAAGCTCTATTATT\t{q70}\tNM:i:2\tMD:Z:9T19T40\tAS:i:60\tXS:i:0",
    "g2\t16\trotavirus\t101\t60\t70M\t*\t0\t0\tGCTACTTCAACATTAGAATTAATGGGTATTCAATATGATTACAATGAAGTATTTACCAGAGTTAAAAGTA\t{q70}\tNM:i:0\tMD:Z:70\tAS:i:70\tXS:i:0",
    "g3\t0\trotavirus\t71\t60\t32M2D36M\t*\t0\t0\tAATACTTCTTTTGAAGCTGCAGTTGTTGCTGCCTTCAACATTAGAATTAATGGGTATTCAATATGATT\t{q68}\tNM:i:2\tMD:Z:32^TA36\tAS:i:60\tXS:i:0",
]


def test_sam_text_snapshot(golden_fastq):
    d = golden_fastq
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem",
         str(d / "ref.fa"), str(d / "reads.fq")],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.splitlines()
    assert lines[0] == "@SQ\tSN:rotavirus\tLN:1074"
    assert lines[1].startswith("@PG\tID:bwamem_tpu")
    body = [l for l in lines if not l.startswith("@")]
    want = [
        e.format(q70="I" * 70, q68="I" * 68) for e in EXPECTED
    ]
    assert body == want
