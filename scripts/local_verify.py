#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/local_verify.py <outDir> <sfDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")

Reads each <outDir>/<name> parquet result + <outDir>/oracle_sql.json,
runs each oracle in DuckDB over the sfDir tables, and compares as a
sorted multiset of rows with columns sorted by name — strict equality,
mirroring a hash-based compare.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            # Type gate: the driver's hasher is type-sensitive (HUGEINT from
            # DuckDB sum(INT) stringifies differently than BIGINT) — fail on
            # any physical-type divergence, not just value divergence.
            wt = {r[0]: r[1] for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
            gt = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
            tmis = {c: (wt.get(c), gt.get(c)) for c in wt if wt.get(c) != gt.get(c)}
            if tmis:
                print(f"FAIL {name}: oracle/spark type mismatch {tmis}")
                n_fail += 1
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif gr != wr:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, wr) if a != b]
            print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; "
                  f"first diffs: {diff[:3]}" if len(gr) == len(wr)
                  else f"FAIL {name}: row count {len(gr)} != {len(wr)}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
