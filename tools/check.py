#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (SURVEY.md §5.6).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run  `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query...]`.

For each query: reads the Spark parquet output, runs the oracle SQL in
DuckDB over views of the sf-dir parquet tables, sorts columns by name,
and compares row-by-row (exact values) AND column-by-column on the
DuckDB-reported TYPE. The driver's gate hashes typed values, so a
HUGEINT oracle column vs Spark's INT64 fails there even when the Python
values are equal (the r9 stream_state_read slip) — this gate now fails
on the same class locally. Prints PASS/FAIL + first diffs.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            grel = con.sql(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            got_cols = list(grel.columns)
            got_types = [str(t) for t in grel.types]
            got = grel.fetchall()
            wrel = con.sql(sql)
            want_cols = list(wrel.columns)
            want_types = [str(t) for t in wrel.types]
            want = wrel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1; continue
        # Signed widths ≤64 bit hash identically on the driver (r9
        # evidence: win_ranking's INTEGER rank vs DuckDB's BIGINT was
        # hash-green) — only types OUTSIDE the signed-64 family, e.g.
        # HUGEINT, diverge. Normalize to match the driver exactly.
        SIGNED = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
        norm = lambda t: "BIGINT" if t in SIGNED else t
        gt = [norm(got_types[i]) for i in gi]
        wt = [norm(want_types[i]) for i in wi]
        if gt != wt:
            cols = [got_cols[i] for i in gi]
            diffs = [f"{c}: spark={a} oracle={b}"
                     for c, a, b in zip(cols, gt, wt) if a != b]
            print(f"FAIL {name}: column TYPE mismatch ({'; '.join(diffs)})")
            n_fail += 1; continue
        g = [tuple(r[i] for i in gi) for r in got]
        w = [tuple(r[i] for i in wi) for r in want]
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} row mismatches; first:")
            for i, a, b in bad[:3]:
                print(f"  row {i}:\n    spark {a}\n    duck  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
