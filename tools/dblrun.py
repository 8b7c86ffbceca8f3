#!/usr/bin/env python3
"""Determinism double-run sweep (SURVEY.md §5.5): every query executed
under two different shuffle-partition counts must produce identical rows.
Catches partition-order-dependent output (float sums, unordered limits)
before the driver's oracle does.

Usage:
  SPARK_GRAFT_CPUS=3 sbt -batch "runMain graft.Verify <sfdir> /tmp/det_a"
  SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify <sfdir> /tmp/det_b"
  python3 tools/dblrun.py /tmp/det_a /tmp/det_b
"""
import sys, os, json
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(json.load(open(f"{a}/oracle_sql.json")).keys()
                   | {d for d in os.listdir(a) if os.path.isdir(f"{a}/{d}")})
    n_pass = n_fail = 0
    for name in names:
        da, db = f"{a}/{name}", f"{b}/{name}"
        if not (os.path.isdir(da) and os.path.isdir(db)):
            print(f"SKIP {name}: missing output"); continue
        ra = con.execute(f"SELECT * FROM read_parquet('{da}/*.parquet')").fetchall()
        rb = con.execute(f"SELECT * FROM read_parquet('{db}/*.parquet')").fetchall()
        if ra == rb:
            n_pass += 1
        else:
            n_fail += 1
            diffs = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:3]
            print(f"FAIL {name}: {len(ra)} vs {len(rb)} rows; first diffs at {diffs}")
            for i in diffs:
                print(f"  a[{i}]={ra[i]}\n  b[{i}]={rb[i]}")
    print(f"\n{n_pass} identical, {n_fail} diverged")
    sys.exit(1 if n_fail else 0)

main()
