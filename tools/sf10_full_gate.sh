#!/usr/bin/env bash
# FULL-REGISTRY sf10 correctness gate — round-12 extension of the
# targeted text/vector sf10 steps to every family (OLAP at 6×10⁷
# lineitem rows, multimodal at 5×10⁵ planted images/audio/video, BFR at
# 2×10⁵ embeddings, retrieval, relational, streaming-twin batch legs).
# Every scale step so far surfaced real defect classes; this is the
# first round the OTHER ~150 queries run above sf1.
#
# Declared-semantics exclusions (named, bounded — both O(n²)-by-
# definition baselines, reasons documented in the targeted r11 scripts):
#   q_ppjoin            — exact answer relation is ~2e10 rows at 500k
#                         docs (organically ~16% of pairs qualify);
#                         digest-certified at sf1; the bounded
#                         q_ppjoin_pairs stratum IS in this gate.
#   q_embedding_near_dup — the DECLARED O(n²) exactness baseline
#                         (4e10 dot products at 200k vectors) the
#                         LSH/banded tiers are measured against; those
#                         scale tiers ARE in this gate.
# (q_minhash_recall rejoined the gate in r13: above Census.RecallFullN
#  docs its ground truth is the md5-ranked doc_a stratum, so the exact
#  intersection stream is corpus-linear instead of ~copies².)
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

# Disk budget as a CONTRACT, not a discovery (the r12 run hit
# disk-full twice live): require enough free space up front for one
# family's Verify dumps plus the DuckDB spill budget. Dumps are deleted
# after each family's compare below, so the bound is per-family.
MIN_FREE_GB="${MIN_FREE_GB:-80}"
FREE_GB=$(df --output=avail -B1G /tmp | tail -1 | tr -d ' ')
if [ "$FREE_GB" -lt "$MIN_FREE_GB" ]; then
  echo "pre-flight: only ${FREE_GB} GB free on /tmp (need ${MIN_FREE_GB} GB) — clean the box first"
  exit 1
fi

if [ ! -d "$SF10_DIR/lineitem.parquet" ]; then
  echo "== generating remaining sf10 tables at $SF10_DIR (100 key-offset copies of sf0.1)"
  sbt -batch "runMain graft.app.TestDataGen /root/testdata/sf0.1 $SF10_DIR 100 customer,supplier,part,orders,lineitem,events,documents,embeddings"
else
  echo "== reusing existing sf10 tables at $SF10_DIR"
fi

echo "== Verify FULL registry at sf10 in three family phases (minus declared exclusions: $EXCLUDE)"
# One Verify session per family PHASE, all dumping into the same OUT_DIR:
# a single session at sf10 accumulates every family's memoized
# localCheckpoint artifacts (~50 GB for the text tier alone) and the
# vector tier's pair relations then exhaust the disk — observed live:
# "No space left on device" at query 113/202, SparkContext torn down.
# Separate JVMs free each phase's block store on exit; the DuckDB
# compare below sees the union.
TEXTQ="q_dedup_exact,q_bow_fingerprint,q_doc_fingerprint,q_minhash_signature"
TEXTQ+=",q_minhash_lsh_pairs,q_minhash_jaccard_est,q_ngram_jaccard,q_containment"
TEXTQ+=",q_simhash,q_simhash_pairs,q_dedup_groups,q_dedup_incremental"
TEXTQ+=",q_dedup_report,q_near_dedup_keep,q_near_dedup_keep_pref"
TEXTQ+=",q_line_dedup,q_substring_dedup,q_dup_span_fraction,q_cdc_chunks"
TEXTQ+=",q_winnowing,q_cross_source_dups,q_source_overlap,q_ppjoin_pairs"
TEXTQ+=",q_graph_bfs,q_pagerank,q_fuzzy_join,q_bloom_decontaminate"
VECQ="q_l2_norm,q_vector_sum_by_label,q_centroids,q_summary_std"
VECQ+=",q_mahalanobis,q_sse_per_label"
VECQ+=",q_kmeans_assign,q_kmeans_centers,q_kmeans_nmi,q_kmeans_mllib_centers"
VECQ+=",q_ann_brute_force,q_ann_ivf,q_ann_ivf_recall,q_ann_ivf_recall_curve"
VECQ+=",q_semantic_knn,q_semantic_dedup"
VECQ+=",q_embedding_lsh_pairs,q_embedding_near_dup_lsh"
VECQ+=",q_embedding_near_dup_banded,q_embedding_dedup_groups"
VECQ+=",q_ann_pq,q_ann_pq_recall,q_ann_sq8"
VECQ+=",q_embedding_outliers,q_embedding_clusters,q_jl_projection"
VECQ+=",q_hybrid_rrf,q_hard_negatives,q_bfr_assign,q_bfr_stats"
rm -rf "$OUT_DIR"
# see tools/sf10_vector_gate.sh for the vm.max_map_count rationale
sysctl -w vm.max_map_count=1048576 2>/dev/null || \
  echo "   (could not raise vm.max_map_count — compare may abort on the largest relations)"

run_phase() {
  local SPEC="$1" LABEL="$2"
  echo "== phase $LABEL: Verify"
  VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
    sbt -batch "runMain graft.Verify $SF10_DIR $OUT_DIR $SPEC" >"$VERIFY_LOG" 2>&1 \
    || { tail -n 60 "$VERIFY_LOG"; echo "sbt/Verify exited non-zero (phase $LABEL)"; exit 1; }
  if grep "\[verify\]" "$VERIFY_LOG"; then
    echo "Verify reported per-query failures (phase $LABEL)"; exit 1
  fi
  rm -rf /tmp/blockmgr-* 2>/dev/null || true

  # Per-FAMILY compare, then delete the family's dumps: disk held is
  # bounded by one family at a time (the r12 run accumulated all three
  # families' dumps plus DuckDB spill and filled the device). Each
  # oracle runs in its OWN DuckDB session with an explicit spill budget
  # (CHECK_ORACLE_PER_QUERY) so no oracle inherits another's pinned
  # buffers — the other r12 failure mode (7 oracle resource deaths).
  echo "== phase $LABEL: DuckDB compare"
  CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
  CHECK_ORACLE_PER_QUERY=1 \
  CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-48GB}" \
  CHECK_ORACLE_SPILL_MAX="${CHECK_ORACLE_SPILL_MAX:-60GB}" \
  CHECK_ORACLE_MIN_FREE_GB="${CHECK_ORACLE_MIN_FREE_GB:-40}" \
  CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-16}" \
  CHECK_ORACLE_JSON="/tmp/sf10_phase_${LABEL}.json" \
    python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR" \
    || true  # fails are tallied in the merged artifact below
  rm -rf "$OUT_DIR"/q_*
}
run_phase "$TEXTQ" "text"
run_phase "$VECQ" "vector"
run_phase "all-but:$EXCLUDE,$TEXTQ,$VECQ" "rest"

echo "== merging phase artifacts"
python3 - "$ROUND" "$SF10_DIR" "$EXCLUDE" <<'EOF'
import json, sys
round_, sf_dir, excl = sys.argv[1], sys.argv[2], sorted(sys.argv[3].split(","))
merged = {"sf_dir": sf_dir, "n_pass": 0, "n_fail": 0, "n_rows_only": 0,
          "n_skipped": len(excl), "pass": [], "rows_only": {},
          "skipped": excl, "fail": {}}
for label in ("text", "vector", "rest"):
    p = json.load(open(f"/tmp/sf10_phase_{label}.json"))
    merged["pass"] += p["pass"]
    merged["rows_only"].update(p["rows_only"])
    merged["fail"].update(p["fail"])
merged["pass"] = sorted(merged["pass"])
merged["n_pass"] = len(merged["pass"])
merged["n_fail"] = len(merged["fail"])
merged["n_rows_only"] = len(merged["rows_only"])
out = f"CORRECTNESS_sf10_r{round_}.json"
json.dump(merged, open(out, "w"), indent=1)
print(f"wrote {out}: {merged['n_pass']} pass / {merged['n_fail']} fail "
      f"/ {merged['n_skipped']} excluded")
sys.exit(1 if merged["fail"] else 0)
EOF
