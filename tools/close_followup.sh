#!/usr/bin/env bash
# Round-close follow-up evidence runs (after tools/gate.sh is green):
#   A. full-contract Verify + type-strict DuckDB compare at sf0.1
#      (the 10x cross-engine anchor behind the README claim)
#   B. per-leg-cold determinism sweep of the connector/catalog keys
#      (stores/catalogs/exports wiped BEFORE EACH leg, 3 vs 7 shuffle
#      partitions), compared with tools/dblrun.py
#   C. a second sf0.1 bench run (BENCH_REF is cut as min-of-two)
# Serialized: never run concurrently with another sbt invocation.
set -euo pipefail
cd "$(dirname "$0")/.."

KEYS=$(grep -oE '"[a-z0-9_]+" +->' src/main/scala/graft/operators/CellConnector.scala \
  | grep -oE '"[a-z0-9_]+"' | tr -d '"' | sort -u | tr '\n' ' ')
echo "== cold-sweep keys: $(echo $KEYS | wc -w)"

echo "== A: Verify @ sf0.1 -> /tmp/v01"
rm -rf /tmp/v01
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01"
python3 tools/check.py /root/testdata/sf0.1 /tmp/v01

echo "== B: per-leg-cold sweep leg A (CPUS=3)"
rm -rf /tmp/graft_cellstore_* /tmp/graft_catalog_* /tmp/graft_export* /tmp/graft_bulk* /tmp/det_cold_a /tmp/det_cold_b
SPARK_GRAFT_CPUS=3 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/det_cold_a $KEYS"
echo "== B: per-leg-cold sweep leg B (CPUS=7)"
rm -rf /tmp/graft_cellstore_* /tmp/graft_catalog_* /tmp/graft_export* /tmp/graft_bulk*
SPARK_GRAFT_CPUS=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/det_cold_b $KEYS"
python3 tools/dblrun.py /tmp/det_cold_a /tmp/det_cold_b

echo "== C: second sf0.1 bench (for the min-of-two reference)"
cp BENCH_FULL.json /tmp/bench_run1.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
cp BENCH_FULL.json /tmp/bench_run2.json

echo "FOLLOWUP GREEN"
