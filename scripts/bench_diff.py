#!/usr/bin/env python3
"""Round-over-round bench regression check (VERDICT r15 task 7).

Usage: python3 scripts/bench_diff.py [r_prev] [r_cur]
  (defaults: the two highest BENCH_r*.json in the repo root; an
  argument may also be a path to a bench json, e.g. target/bench_last.json)

Extracts the per-query seconds map from each round's driver archive
(BENCH_r{N}.json stores the Bench stdout tail; the compact
{"metric":...,"queries":{...}} line is emitted first since r15 so it
survives tail truncation), prints queries present in both rounds whose
time moved >1.3x either way plus added/removed queries, and exits 1 if
any regression >1.3x was found. Calibration drift (calib_ms medians)
is shown so host-speed movement is visible next to the per-query ratios.
"""
import json
import re
import sys
import glob
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH = 1.3
FLOOR_SEC = 0.5  # ignore ratio noise under this absolute time


def load_queries(spec):
    """spec: round number, BENCH path, or bench_last-style path."""
    if isinstance(spec, int) or re.fullmatch(r"\d+", str(spec)):
        path = os.path.join(ROOT, f"BENCH_r{int(spec):02d}.json")
    else:
        path = spec
    with open(path) as f:
        raw = f.read()
    d = json.JSONDecoder().raw_decode(raw)[0]
    # a raw Bench compact line (target/bench_last.json)
    if "queries" in d and isinstance(d["queries"], dict) and d["queries"]:
        return d.get("queries"), d.get("calib_ms"), path
    blob = d.get("tail") or ""
    if isinstance(d.get("parsed"), dict) and d["parsed"].get("queries"):
        p = d["parsed"]
        return p["queries"], p.get("calib_ms"), path
    # find every {"metric":...} object start; take the last complete one
    best = None
    for m in re.finditer(r'\{"metric"', blob):
        try:
            best = json.JSONDecoder().raw_decode(blob, m.start())[0]
        except ValueError:
            continue
    if best and best.get("queries"):
        return best["queries"], best.get("calib_ms"), path
    # truncated tail: scavenge "name":sec pairs inside a queries block
    qm = re.search(r'"queries":\{([^}]*)', blob)
    src = qm.group(1) if qm else blob
    pairs = re.findall(r'"([a-z][a-z0-9_]{2,})":([0-9]+\.[0-9]+)', src)
    if not qm and pairs:
        # head-truncated tail: the first key may be cut mid-name
        pairs = pairs[1:]
    # drop bench-protocol scalars that share the pair shape
    drop = {"value", "sf", "calib_ms", "total"}
    qs = {k: float(v) for k, v in pairs if k not in drop}
    if qs:
        return qs, None, path
    raise SystemExit(f"no per-query data recoverable from {path}")


def main():
    args = sys.argv[1:]
    if len(args) == 2:
        prev_s, cur_s = args
    else:
        rounds = sorted(
            int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if len(args) == 1:
            prev_s, cur_s = str(rounds[-1]), args[0]
        else:
            prev_s, cur_s = str(rounds[-2]), str(rounds[-1])
    prev, pcal, ppath = load_queries(prev_s)
    cur, ccal, cpath = load_queries(cur_s)
    print(f"prev: {os.path.basename(ppath)} ({len(prev)} queries)   "
          f"cur: {os.path.basename(cpath)} ({len(cur)} queries)")
    if pcal and ccal:
        pm, cm = statistics.median(pcal), statistics.median(ccal)
        print(f"calib median: {pm:.0f} ms -> {cm:.0f} ms "
              f"(host ratio x{cm / pm:.2f})")
    common = sorted(set(prev) & set(cur))
    movers = []
    for q in common:
        a, b = prev[q], cur[q]
        if max(a, b) < FLOOR_SEC:
            continue
        r = b / a if a > 0 else float("inf")
        if r > THRESH or r < 1 / THRESH:
            movers.append((r, q, a, b))
    movers.sort(reverse=True)
    regressions = [m for m in movers if m[0] > THRESH]
    if movers:
        print(f"\nmovers >{THRESH}x (of {len(common)} common, "
              f">{FLOOR_SEC}s):")
        for r, q, a, b in movers:
            tag = "SLOWER" if r > 1 else "faster"
            print(f"  {q:<34} {a:7.2f}s -> {b:7.2f}s  x{r:.2f} {tag}")
    else:
        print(f"\nno movers >{THRESH}x among {len(common)} common queries")
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    if added:
        print("added:  ", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    tp = sum(prev[q] for q in common)
    tc = sum(cur[q] for q in common)
    print(f"\ncommon-subset total: {tp:.1f}s -> {tc:.1f}s  x{tc / tp:.2f}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
