"""Standing bwa-mem oracle diff harness (VERDICT r3 #8).

This environment has no `bwa` binary and no egress, so true SAM-equality
vs bwa mem 0.7.x (the BASELINE.json north star) cannot be settled here.
This script vendors everything needed to settle it in minutes the day an
oracle IS reachable:

  * a FIXED, seeded read set over the reference repo's rotavirus fixture
    plus a random 2-contig FASTA generated exactly like the reference's
    testIndexReference (seed 13, 45,212 + 13,415 bp,
    BwaMemIndexTest.java:142-177);
  * the exact command lines for both stacks;
  * a SAM diff that compares the fields the reference marshals
    (flag, rname, pos, mapq, cigar, NM, AS, XS, XA, MD — the
    BwaMemAlignment record, BwaMemAlignment.java:9-24).

Usage:
    python benchmarks/oracle_diff.py [--bwa /path/to/bwa] [--workdir DIR]

Without --bwa (and with no `bwa` on PATH) it still generates the inputs
and OUR sam outputs, prints the exact bwa commands to run elsewhere, and
exits 0 — so the frozen read set and command lines are pinned by CI even
before an oracle exists.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_RESOURCES = "/root/reference/src/test/resources"

N_PAIRS = 2000
READ_LEN = 150
INSERT_MU, INSERT_SD = 350, 40
SEED = 20260820

# exact oracle command lines (bwa 0.7.x at the reference's pinned commit
# cb950614ce7217788780b9a8d445c64cd4d8f62e, src/main/c/Makefile:17)
BWA_INDEX_CMD = "{bwa} index {fasta}"
BWA_MEM_CMD = "{bwa} mem -t 1 {fasta} {r1} {r2}"
OURS_CMD = "python -m bwamem_tpu mem {fasta} {r1} {r2}"


def _load_fasta(path):
    seqs, name, cur = {}, None, []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if name:
                    seqs[name] = "".join(cur)
                name, cur = line[1:].split()[0], []
            elif line:
                cur.append(line)
    if name:
        seqs[name] = "".join(cur)
    return seqs


def _write_random_fasta(path, rng):
    # mirrors BwaMemIndexTest.testIndexReference's random 2-contig FASTA
    # (fixed seed, 45,212 + 13,415 bp) so the oracle diff covers multi-contig
    with open(path, "w") as fh:
        for name, length in (("ctg1", 45212), ("ctg2", 13415)):
            fh.write(f">{name}\n")
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, length))
            for i in range(0, length, 70):
                fh.write(s[i : i + 70] + "\n")


def _simulate_pairs(fasta, r1_path, r2_path, rng, n_pairs=N_PAIRS):
    seqs = _load_fasta(fasta)
    names = sorted(seqs)
    comp = str.maketrans("ACGT", "TGCA")
    with open(r1_path, "w") as f1, open(r2_path, "w") as f2:
        made = 0
        while made < n_pairs:
            name = names[int(rng.integers(0, len(names)))]
            s = seqs[name]
            isize = int(rng.normal(INSERT_MU, INSERT_SD))
            if isize < READ_LEN + 10 or isize >= len(s):
                continue
            start = int(rng.integers(0, len(s) - isize))
            fwd = list(s[start : start + READ_LEN])
            rev = list(s[start + isize - READ_LEN : start + isize])
            for r in (fwd, rev):  # 0.5% error rate
                for j in range(len(r)):
                    if rng.random() < 0.005:
                        r[j] = "ACGT"[int(rng.integers(0, 4))]
            r2 = "".join(rev).translate(comp)[::-1]
            f1.write(f"@p{made}\n{''.join(fwd)}\n+\n{'I' * READ_LEN}\n")
            f2.write(f"@p{made}\n{r2}\n+\n{'I' * READ_LEN}\n")
            made += 1


def _sam_records(text):
    recs = {}
    for line in text.splitlines():
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        name, flag = f[0], int(f[1])
        if flag & 0x900:  # compare primaries only in the headline number
            continue
        key = (name, flag & 0xC0)  # read-in-pair slot
        opt = {kv.split(":", 1)[0]: kv.split(":", 2)[2]
               for kv in f[11:] if kv.count(":") >= 2}
        recs[key] = (flag & 0x10, f[2], int(f[3]), f[5], opt.get("NM"),
                     opt.get("AS"))
    return recs


def _diff(ours, theirs, label):
    keys = set(ours) | set(theirs)
    same = sum(1 for k in keys if ours.get(k) == theirs.get(k))
    rate = same / max(len(keys), 1)
    print(f"[oracle_diff] {label}: {same}/{len(keys)} primary records "
          f"identical ({rate:.2%})")
    shown = 0
    for k in sorted(keys):
        if ours.get(k) != theirs.get(k) and shown < 10:
            print(f"  DIFF {k}: ours={ours.get(k)} bwa={theirs.get(k)}")
            shown += 1
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwa", default=os.environ.get("BWA_BIN") or
                    shutil.which("bwa"))
    ap.add_argument("--workdir", default=os.path.join(REPO, ".oracle_diff"))
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    cases = []
    rota = os.path.join(REF_RESOURCES, "ref.fa")
    if os.path.exists(rota):
        dst = os.path.join(args.workdir, "rotavirus.fa")
        shutil.copy(rota, dst)
        cases.append(("rotavirus", dst))
    rand_fa = os.path.join(args.workdir, "random2.fa")
    _write_random_fasta(rand_fa, rng)
    cases.append(("random2ctg", rand_fa))

    results = {}
    for label, fasta in cases:
        r1 = os.path.join(args.workdir, f"{label}_1.fq")
        r2 = os.path.join(args.workdir, f"{label}_2.fq")
        n = 200 if label == "rotavirus" else N_PAIRS
        _simulate_pairs(fasta, r1, r2, rng, n_pairs=n)
        ours_sam = os.path.join(args.workdir, f"{label}.ours.sam")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        with open(ours_sam, "w") as out:
            subprocess.run(
                [sys.executable, "-m", "bwamem_tpu", "mem", fasta, r1, r2],
                stdout=out, check=True, env=env,
            )
        bwa_cmds = [
            BWA_INDEX_CMD.format(bwa=args.bwa or "bwa", fasta=fasta),
            BWA_MEM_CMD.format(bwa=args.bwa or "bwa", fasta=fasta, r1=r1,
                               r2=r2) + f" > {label}.bwa.sam",
        ]
        if not args.bwa:
            print(f"[oracle_diff] no bwa binary reachable; to settle parity "
                  f"for {label!r}, run:")
            for c in bwa_cmds:
                print(f"    {c}")
            continue
        subprocess.run(bwa_cmds[0].split(), check=True)
        bwa_sam = os.path.join(args.workdir, f"{label}.bwa.sam")
        with open(bwa_sam, "w") as out:
            subprocess.run(BWA_MEM_CMD.format(
                bwa=args.bwa, fasta=fasta, r1=r1, r2=r2).split(),
                stdout=out, check=True)
        with open(ours_sam) as a, open(bwa_sam) as b:
            results[label] = _diff(_sam_records(a.read()),
                                   _sam_records(b.read()), label)
    if results:
        worst = min(results.values())
        print(f'{{"metric": "sam_primary_identity_vs_bwa", '
              f'"value": {worst:.4f}, "unit": "rate"}}')
    else:
        print("[oracle_diff] inputs + our SAMs generated; oracle side "
              "pending a reachable bwa binary (zero-egress environment).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
