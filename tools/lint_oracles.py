#!/usr/bin/env python3
"""Mechanical oracle-type lint (VERDICT r9 #2).

Plans (DESCRIBE — no execution) every oracle SQL against views of the
sf-dir parquet tables and FAILS if any output column has a DuckDB type
Spark cannot emit from parquet. The canonical offender: a bare
`sum(int_col)` returns HUGEINT in DuckDB while Spark writes INT64, so
the driver's typed hash gate fails even when values match (the r9
stream_state_read slip). House convention: wrap integer aggregates in
`CAST(... AS BIGINT)`.

This is a planning-only lint, so it runs in seconds and does not need
the Spark output — use it before a full Verify cycle. The executed
type-strict compare lives in tools/check.py.

Usage: python3 tools/lint_oracles.py <sfdir> <oracle_sql.json>
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types DuckDB can plan but Spark parquet output can never carry.
FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
             "UTINYINT", "INT128", "UINT128", "UINT64", "UINT32",
             "UINT16", "UINT8"}


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle does not plan: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in rows
               if t.split("(")[0].upper() in FORBIDDEN]
        if bad:
            cols = ", ".join(f"{c}: {t}" for c, t in bad)
            print(f"FAIL {name}: un-Spark-able oracle type ({cols}) — "
                  f"wrap integer aggregates in CAST(... AS BIGINT)")
            n_bad += 1
    print(f"\n{len(oracles) - n_bad} clean, {n_bad} flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
