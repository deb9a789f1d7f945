#!/usr/bin/env bash
# Standing sf1 correctness gate (round-10 lesson: two engine-defect
# classes were invisible below sf1). Regenerates sf1 deterministically
# from the driver's sf0.1 testdata, runs the FULL query registry through
# graft.Verify, then the DuckDB oracle compare — writing a per-round
# machine-readable artifact CORRECTNESS_sf1_r<N>.json at the repo root.
#
# Usage: tools/sf1_gate.sh <round> [sf1_dir] [out_dir]
#   round    round number for the artifact name (e.g. 11)
#   sf1_dir  where to (re)generate sf1 parquet   [default /tmp/testdata_sf1]
#   out_dir  Verify dump dir                     [default /tmp/verify_sf1_gate]
#
# Wall-clock at local[32]: ~3 min generate + ~20 min Verify + ~15 min
# DuckDB compare. Do NOT run concurrently with other Spark JVMs.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf1_gate.sh <round> [sf1_dir] [out_dir]}"
SF1_DIR="${2:-/tmp/testdata_sf1}"
OUT_DIR="${3:-/tmp/verify_sf1_gate}"

if [ ! -d "$SF1_DIR/lineitem.parquet" ] && [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "== generating sf1 at $SF1_DIR (10 key-offset copies of sf0.1)"
  sbt -batch "runMain graft.app.TestDataGen /root/testdata/sf0.1 $SF1_DIR 10"
else
  echo "== reusing existing sf1 at $SF1_DIR"
fi

echo "== Verify full registry at sf1"
rm -rf "$OUT_DIR"
VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
# capture the full sbt output and check its exit status EXPLICITLY:
# the old `sbt | grep [verify] || true` swallowed wholesale sbt
# failures (compile error, JVM OOM) that print no [verify] line
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
  sbt -batch "runMain graft.Verify $SF1_DIR $OUT_DIR" >"$VERIFY_LOG" 2>&1 \
  || { tail -n 60 "$VERIFY_LOG"; echo "sbt/Verify exited non-zero"; exit 1; }
if grep "\[verify\]" "$VERIFY_LOG"; then
  echo "Verify reported per-query failures"; exit 1
fi

echo "== DuckDB oracle compare at sf1"
# No default memory cap here: the gate runs alone by contract, and
# q_embedding_dedup_groups's oracle legitimately streams ~90 GB through
# a cross-join aggregate that fits DuckDB's 80%-of-RAM default but
# spills >78 GB (exhausting /tmp) under an 80 GB cap. Set
# CHECK_ORACLE_MEMLIMIT explicitly if running alongside other work.
CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
CHECK_ORACLE_JSON="CORRECTNESS_sf1_r${ROUND}.json" \
  python3 tools/check_oracle.py "$SF1_DIR" "$OUT_DIR"
