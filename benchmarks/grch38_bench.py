"""Whole-GRCh38-scale (3.1 Gbp) end-to-end proof — the int64 index path.

Thin configuration of benchmarks/gbp_bench.py (one shared driver): 6.2 G
SA symbols exceed the builder's int32 fast path (2 Gbp), so this run pins
the int64 recursion plus the staged buffer release that keeps peak RSS
under ~100 GB (index/native/sais.cpp, index/build.py interleave slicing).

Run alone:  python benchmarks/grch38_bench.py [out.json]   (~60 min)
"""
import os
import sys

os.environ.setdefault("GBP_REF_LEN", "3100000000")
os.environ.setdefault("GBP_PAIRS", "3000")
os.environ.setdefault("GBP_LABEL", "grch38")
os.environ.setdefault("GBP_ALGO", "rb2")  # the bounded-memory artifact

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gbp_bench import main  # noqa: E402

if __name__ == "__main__":
    main()
