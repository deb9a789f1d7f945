#!/usr/bin/env bash
# Targeted text-tier scale step: 100× the sf0.1 documents corpus
# (500k docs — an order of magnitude over the sf1 gate's 50k) through
# the registry's dedup/fingerprint family, then the DuckDB compare.
# This is the step where regime constants can silently break
# (hotBucketThreshold 256 vs copies-sized near-dup cliques, the
# census-driven SimHash width crossing to W=64, window allow-lists),
# so every red here is engine work, not noise.
#
# Usage: tools/sf10_text_gate.sh <round> [sf10_dir] [out_dir]
# Writes CORRECTNESS_sf10text_r<N>.json at the repo root.
# Do NOT run concurrently with other Spark JVMs.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf10_text_gate.sh <round> [sf10_dir] [out_dir]}"
SF10_DIR="${2:-/tmp/testdata_sf10}"
OUT_DIR="${3:-/tmp/verify_sf10_text}"

# the registry's documents-only dedup/fingerprint family
QUERIES="q_dedup_exact,q_bow_fingerprint,q_doc_fingerprint,q_minhash_signature"
QUERIES+=",q_minhash_lsh_pairs,q_minhash_jaccard_est,q_ngram_jaccard,q_containment"
QUERIES+=",q_simhash,q_simhash_pairs,q_dedup_groups,q_dedup_incremental"
QUERIES+=",q_dedup_report,q_near_dedup_keep,q_near_dedup_keep_pref"
QUERIES+=",q_line_dedup,q_substring_dedup,q_dup_span_fraction,q_cdc_chunks"
QUERIES+=",q_winnowing,q_cross_source_dups,q_source_overlap"
# q_ppjoin is deliberately NOT in the sf10 family: on this corpus ~16% of
# ALL doc pairs are Jaccard>=0.8 (organic density measured at sf1: 2e8
# verified pairs over 50k docs), so the ANSWER relation at 500k docs is
# ~2e10 rows by declared semantics — no engine or oracle can materialize
# it; the digest bounds the COMPARED surface, not the computed relation.
# The operator is digest-certified at sf1 and its 64+-rank-vocabulary
# regression (the defect this step surfaced) is pinned in OperatorsSpec.

if [ ! -d "$SF10_DIR/documents.parquet" ]; then
  echo "== generating sf10 documents at $SF10_DIR (100 key-offset copies of sf0.1)"
  sbt -batch "runMain graft.app.TestDataGen /root/testdata/sf0.1 $SF10_DIR 100 documents"
else
  echo "== reusing existing sf10 documents at $SF10_DIR"
fi

echo "== Verify text/dedup family at sf10 (500k docs)"
rm -rf "$OUT_DIR"
VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
# capture the full sbt output and check its exit status EXPLICITLY:
# the old `sbt | grep [verify] || true` swallowed wholesale sbt
# failures (compile error, JVM OOM) that print no [verify] line
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
  sbt -batch "runMain graft.Verify $SF10_DIR $OUT_DIR $QUERIES" >"$VERIFY_LOG" 2>&1 \
  || { tail -n 60 "$VERIFY_LOG"; echo "sbt/Verify exited non-zero"; exit 1; }
if grep "\[verify\]" "$VERIFY_LOG"; then
  echo "Verify reported per-query failures"; exit 1
fi

echo "== DuckDB oracle compare at sf10"
python3 - "$OUT_DIR" "$QUERIES" <<'EOF'
import json, sys
out_dir, queries = sys.argv[1], set(sys.argv[2].split(","))
o = json.load(open(f"{out_dir}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in queries},
          open(f"{out_dir}/oracle_sql.json", "w"))
EOF
CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-80GB}" \
CHECK_ORACLE_JSON="CORRECTNESS_sf10text_r${ROUND}.json" \
  python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR"
