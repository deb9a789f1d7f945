#!/usr/bin/env bash
# Standing sf1 correctness gate (round-10 lesson: two engine-defect
# classes were invisible below sf1). Regenerates sf1 deterministically
# from the driver's sf0.1 testdata, runs the FULL query registry through
# graft.Verify, then the DuckDB oracle compare — writing a per-round
# machine-readable artifact CORRECTNESS_sf1_r<N>.json at the repo root.
#
# r14 revision: Verify runs as a direct `java -cp` JVM (no sbt lock, no
# mid-run recompile), and the compare runs per-query under an explicit
# memory/spill budget with CHECK_ORACLE_SCALE=1 — the one oracle that
# genuinely needed ~90 GB resident (q_embedding_dedup_groups, whose base
# oracle re-derives the banded candidate chain) now composes over the
# verified q_embedding_near_dup_banded dump instead, so the whole gate
# fits a capped budget and can run alongside other work.
#
# Usage: tools/sf1_gate.sh <round> [sf1_dir] [out_dir]
# Requires `sbt compile` to be CURRENT (runs target/scala-2.13/classes).
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf1_gate.sh <round> [sf1_dir] [out_dir]}"
SF1_DIR="${2:-/tmp/testdata_sf1}"
OUT_DIR="${3:-/tmp/verify_sf1_gate}"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
[ -f target/scala-2.13/classes/graft/Verify.class ] || {
  echo "pre-flight: target/scala-2.13/classes is missing graft.Verify — run 'sbt compile' first"; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

if [ ! -d "$SF1_DIR/lineitem.parquet" ] && [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "== generating sf1 at $SF1_DIR (10 key-offset copies of sf0.1)"
  # shellcheck disable=SC2086
  java -cp "$CP" $ADD_OPENS $JFLAGS -Xmx16g graft.app.TestDataGen \
    /root/testdata/sf0.1 "$SF1_DIR" 10
else
  echo "== reusing existing sf1 at $SF1_DIR"
fi

echo "== Verify full registry at sf1"
rm -rf "$OUT_DIR"
VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
# Own spark.local.dir: isolates this JVM's shuffle files from any
# concurrent gate's cleanup (a shared /tmp blockmgr glob deleted this
# gate's live temp_shuffle files mid-run in r14).
LOCAL_DIR="/tmp/sf1_gate_local"
rm -rf "$LOCAL_DIR"; mkdir -p "$LOCAL_DIR"
# shellcheck disable=SC2086
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java -cp "$CP" $ADD_OPENS $JFLAGS -Dspark.local.dir="$LOCAL_DIR" \
    -Djava.io.tmpdir="$LOCAL_DIR" \
    -Xmx"${SPARK_DRIVER_MEM:-24g}" \
    graft.Verify "$SF1_DIR" "$OUT_DIR" >"$VERIFY_LOG" 2>&1 \
  || { tail -n 60 "$VERIFY_LOG"; echo "Verify exited non-zero"; exit 1; }
rm -rf "$LOCAL_DIR"
if grep "\[verify\]" "$VERIFY_LOG"; then
  echo "Verify reported per-query failures"; exit 1
fi

echo "== DuckDB oracle compare at sf1"
ART="CORRECTNESS_sf1_r${ROUND}.json"
CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
CHECK_ORACLE_PER_QUERY=1 \
CHECK_ORACLE_SCALE=1 \
CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-24GB}" \
CHECK_ORACLE_SPILL_MAX="${CHECK_ORACLE_SPILL_MAX:-40GB}" \
CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-8}" \
CHECK_ORACLE_JSON="$ART" \
  python3 tools/check_oracle.py "$SF1_DIR" "$OUT_DIR" \
  || { [ -s "$ART" ] || { echo "compare left no artifact"; exit 1; }
       echo "compare reported failures — see $ART"; exit 1; }
[ -s "$ART" ] || { echo "compare left no artifact"; exit 1; }
