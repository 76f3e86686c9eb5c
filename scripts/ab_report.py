#!/usr/bin/env python3
"""Summarize scripts/ab_bench.sh output: per-query min across rounds
for each build, ratio cur/r10, plus the calib ledger proving both
legs shared one host window."""
import glob
import json
import os

AB = "/root/repo/target/ab"


def mins(leg):
    out = {}
    for f in sorted(glob.glob(f"{AB}/{leg}_*.log")):
        if os.path.getsize(f) == 0:
            continue
        qs = json.load(open(f))["queries"]
        for k, v in qs.items():
            out.setdefault(k, []).append(v)
    return {k: min(v) for k, v in out.items()}, {
        k: len(v) for k, v in out.items()}


def main():
    r10, n10 = mins("r10")
    cur, ncur = mins("cur")
    print(f"{'query':34s} {'r10 min':>8s} {'cur min':>8s} {'cur/r10':>8s} samples")
    for q in sorted(set(r10) | set(cur)):
        a, b = r10.get(q), cur.get(q)
        r = f"{b / a:8.2f}" if a and b else "     n/a"
        print(f"{q:34s} {a or 0:8.2f} {b or 0:8.2f} {r} "
              f"{n10.get(q, 0)}+{ncur.get(q, 0)}")
    print("\ncalib ledger (ms; one host window iff these stay in one band):")
    print(open(f"{AB}/calib.txt").read())


if __name__ == "__main__":
    main()
