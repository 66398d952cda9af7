"""CLI -p smart pairing (bwa mem -p, MEM_F_SMARTPE, BwaMemAligner.java:76-84):
one interleaved FASTQ behaves exactly like the two-file paired-end path,
MEM_F_SMARTPE is observable on the options, and a dangling final read is
dropped with a warning rather than mispaired.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_RESOURCES

from bwamem_tpu.index import bwtfile


@pytest.fixture(scope="module")
def pe_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("smartpe")
    idx = bwtfile.read_index_files(f"{REFERENCE_RESOURCES}/ref.fa")
    fwd = idx.get_seq(0, idx.bns.l_pac)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(31)
    fq1, fq2, fqi = d / "r1.fq", d / "r2.fq", d / "inter.fq"
    n = 120
    with open(fq1, "w") as f1, open(fq2, "w") as f2, open(fqi, "w") as fi:
        for i in range(n):
            isize = int(rng.integers(180, 300))
            s = int(rng.integers(0, len(fwd) - isize - 1))
            r1 = bases[fwd[s : s + 70]].tobytes().decode()
            r2 = bases[(3 - fwd[s + isize - 70 : s + isize])[::-1]].tobytes().decode()
            rec1 = f"@p{i}\n{r1}\n+\n{'I' * 70}\n"
            rec2 = f"@p{i}\n{r2}\n+\n{'I' * 70}\n"
            f1.write(rec1)
            f2.write(rec2)
            fi.write(rec1)
            fi.write(rec2)
    fa = str(d / "ref.fa")
    shutil.copy(f"{REFERENCE_RESOURCES}/ref.fa", fa)
    return fa, str(fq1), str(fq2), str(fqi), n


def _run_mem(args):
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu", "mem", *args],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    sam = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    return sam, r.stderr


def test_smart_pairing_equals_two_file_pe(pe_files):
    fa, fq1, fq2, fqi, n = pe_files
    two, _ = _run_mem([fa, fq1, fq2, "--insert-mean", "240"])
    one, _ = _run_mem([fa, fqi, "-p", "--insert-mean", "240"])
    assert one == two
    assert len(one) >= 2 * n


def test_smart_pairing_sharded_merge(pe_files):
    fa, fq1, fq2, fqi, n = pe_files
    full, _ = _run_mem([fa, fqi, "-p", "--insert-mean", "240"])
    s0, _ = _run_mem([fa, fqi, "-p", "--insert-mean", "240", "--shard", "0/2"])
    s1, _ = _run_mem([fa, fqi, "-p", "--insert-mean", "240", "--shard", "1/2"])
    assert sorted(s0 + s1) == sorted(full)


def test_smart_pairing_odd_read_dropped(pe_files, tmp_path):
    fa, fq1, fq2, fqi, n = pe_files
    odd = str(tmp_path / "odd.fq")
    with open(fqi) as f, open(odd, "w") as g:
        g.write(f.read())
        g.write("@dangling\nACGTACGTACGTACGTACGTACGTACGT\n+\n"
                + "I" * 28 + "\n")
    sam, err = _run_mem([fa, odd, "-p", "--insert-mean", "240"])
    assert "dropping unpaired final read 'dangling'" in err
    assert not any(l.startswith("dangling\t") for l in sam)
    base, _ = _run_mem([fa, fqi, "-p", "--insert-mean", "240"])
    assert sam == base


def test_smartpe_flag_set():
    """-p must set MEM_F_SMARTPE on the options (observable engine flag)."""
    from bwamem_tpu.api.options import MEM_F_PE, MEM_F_SMARTPE, MemOptions

    opt = MemOptions()
    opt.flag |= MEM_F_PE | MEM_F_SMARTPE
    assert opt.flag & MEM_F_SMARTPE
