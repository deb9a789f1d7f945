#!/usr/bin/env bash
# FULL-REGISTRY sf10 correctness gate — round-12 extension of the
# targeted text/vector sf10 steps to every family (OLAP at 6×10⁷
# lineitem rows, multimodal at 5×10⁵ planted images/audio/video, BFR at
# 2×10⁵ embeddings, retrieval, relational, streaming-twin batch legs).
# Every scale step so far surfaced real defect classes; this is the
# first round the OTHER ~150 queries run above sf1.
#
# Declared-semantics exclusions (named, bounded — the same two as the
# targeted r11 steps, reasons documented in those scripts):
#   q_ppjoin            — exact answer relation is ~2e10 rows at 500k
#                         docs (organically ~16% of pairs qualify);
#                         digest-certified at sf1.
#   q_embedding_near_dup — the DECLARED O(n²) exactness baseline
#                         (4e10 dot products at 200k vectors) the
#                         LSH/banded tiers are measured against; those
#                         scale tiers ARE in this gate.
#
# Usage: tools/sf10_full_gate.sh <round> [sf10_dir] [out_dir]
# Writes CORRECTNESS_sf10_r<N>.json at the repo root.
# Do NOT run concurrently with other Spark JVMs.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf10_full_gate.sh <round> [sf10_dir] [out_dir]}"
SF10_DIR="${2:-/tmp/testdata_sf10}"
OUT_DIR="${3:-/tmp/verify_sf10_full}"
EXCLUDE="q_ppjoin,q_embedding_near_dup"

if [ ! -d "$SF10_DIR/lineitem.parquet" ]; then
  echo "== generating remaining sf10 tables at $SF10_DIR (100 key-offset copies of sf0.1)"
  sbt -batch "runMain graft.app.TestDataGen /root/testdata/sf0.1 $SF10_DIR 100 customer,supplier,part,orders,lineitem,events,documents,embeddings"
else
  echo "== reusing existing sf10 tables at $SF10_DIR"
fi

echo "== Verify FULL registry at sf10 (minus declared exclusions: $EXCLUDE)"
rm -rf "$OUT_DIR"
VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
  sbt -batch "runMain graft.Verify $SF10_DIR $OUT_DIR all-but:$EXCLUDE" >"$VERIFY_LOG" 2>&1 \
  || { tail -n 60 "$VERIFY_LOG"; echo "sbt/Verify exited non-zero"; exit 1; }
if grep "\[verify\]" "$VERIFY_LOG"; then
  echo "Verify reported per-query failures"; exit 1
fi

echo "== DuckDB oracle compare at sf10"
# see tools/sf10_vector_gate.sh for the vm.max_map_count rationale
sysctl -w vm.max_map_count=1048576 2>/dev/null || \
  echo "   (could not raise vm.max_map_count — compare may abort on the largest relations)"
python3 - "$OUT_DIR" "$EXCLUDE" <<'EOF'
import json, sys
out_dir, excl = sys.argv[1], set(sys.argv[2].split(","))
o = json.load(open(f"{out_dir}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k not in excl},
          open(f"{out_dir}/oracle_sql.json", "w"))
EOF
CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-60GB}" \
CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-16}" \
CHECK_ORACLE_JSON="CORRECTNESS_sf10_r${ROUND}.json" \
  python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR"
