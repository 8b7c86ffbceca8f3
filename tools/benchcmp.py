#!/usr/bin/env python3
"""Mechanical stall-vs-regression triage for bench runs (VERDICT r8 #8).

Compares a bench JSON (BENCH_FULL.json or a parsed BENCH_r*.json) against
the committed per-query reference BENCH_REF.json (min-of-two, warm shared
session, local[32], sf0.1 — regenerate with:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" && cp BENCH_FULL.json BENCH_REF.json
  # then edit BENCH_REF.json's "meta" note if conditions changed).

Classification per query, using NOISE.md's variance model (sessions jitter
~±8% on totals; individual queries stall ×2-×7 at random with idle CPU):

  ok        t <= ref * TOL_MULT + TOL_ADD
  suspect   above that line — a candidate stall OR regression; adjudicate
            with `sbt "runMain graft.Probe <query> 4"` (min of a few
            isolated reps): if the isolated min matches ref, it was a
            stall; if it matches the new time, it's a real regression.
  new       no reference entry (key added since the reference was cut)

Exit code 0 always: this is a triage report, not a gate — the oracle
compare (tools/check.py) is the gate.

Usage: python3 tools/benchcmp.py [bench_json] [ref_json]
"""
import json
import sys

TOL_MULT = 1.6   # generous per-query session jitter multiplier
TOL_ADD = 0.40   # absolute slack for sub-second queries (seconds)


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map")
    return d


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_REF.json"
    bench, ref = load(bench_path), load(ref_path)
    rq = ref["queries"]
    suspects, new = [], []
    for name, t in sorted(bench["queries"].items()):
        r = rq.get(name)
        if r is None:
            new.append((name, t))
        elif t > r * TOL_MULT + TOL_ADD:
            suspects.append((name, t, r))
    print(f"bench   {bench_path}: {len(bench['queries'])} queries, "
          f"total {bench.get('value', '?')} s")
    print(f"ref     {ref_path}: {len(rq)} queries "
          f"({ref.get('meta', 'no meta')})")
    print(f"ok      {len(bench['queries']) - len(suspects) - len(new)}")
    for name, t in new:
        print(f"new     {name}: {t:.2f} s (no reference — re-cut BENCH_REF"
              " after the round lands)")
    for name, t, r in sorted(suspects, key=lambda x: -(x[1] - x[2])):
        print(f"SUSPECT {name}: {t:.2f} s vs ref {r:.2f} s "
              f"({t / r:.1f}x) -> adjudicate: sbt 'runMain graft.Probe "
              f"{name} 4'")
    if not suspects:
        print("no suspects: every query inside the session-jitter envelope")


if __name__ == "__main__":
    main()
