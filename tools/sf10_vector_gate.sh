#!/usr/bin/env bash
# Targeted vector-tier scale step: 100× the sf0.1 embeddings corpus
# (200k vectors × 64d — an order of magnitude over the sf1 gate's 20k)
# through the registry's ANN/embedding-dedup/k-means family, then the
# DuckDB compare. The sibling of tools/sf10_text_gate.sh: this is the
# step where the VECTOR tier's regime constants can silently break
# (the served IVF quantizer's cell count vs corpus size — SemDeDup's
# "cell-bounded" quadratic is only bounded if cells stay bounded; the
# census band-width range; the local/distributed k-means fit seam),
# so every red here is engine work, not noise.
#
# Usage: tools/sf10_vector_gate.sh <round> [sf10_dir] [out_dir]
# Writes CORRECTNESS_sf10vec_r<N>.json at the repo root.
# Do NOT run concurrently with other Spark JVMs.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf10_vector_gate.sh <round> [sf10_dir] [out_dir]}"
SF10_DIR="${2:-/tmp/testdata_sf10}"
OUT_DIR="${3:-/tmp/verify_sf10_vec}"

# the registry's embeddings-reading family: linear vector aggregations,
# k-means/NMI, ANN (brute-force baseline + IVF/PQ/SQ8 scale tiers +
# recall evaluations), SemDeDup, LSH/banded near-dup + CC grouping,
# outliers, JL projection, and the retrieval fusions that mix lexical
# and embedding ranks
QUERIES="q_l2_norm,q_vector_sum_by_label,q_centroids,q_summary_std"
QUERIES+=",q_mahalanobis,q_sse_per_label"
QUERIES+=",q_kmeans_assign,q_kmeans_centers,q_kmeans_nmi,q_kmeans_mllib_centers"
QUERIES+=",q_ann_brute_force,q_ann_ivf,q_ann_ivf_recall,q_ann_ivf_recall_curve"
QUERIES+=",q_semantic_knn,q_semantic_dedup"
QUERIES+=",q_embedding_lsh_pairs,q_embedding_near_dup_lsh"
QUERIES+=",q_embedding_near_dup_banded,q_embedding_dedup_groups"
QUERIES+=",q_ann_pq,q_ann_pq_recall,q_ann_sq8"
QUERIES+=",q_embedding_outliers,q_embedding_clusters,q_jl_projection"
QUERIES+=",q_hybrid_rrf,q_hard_negatives"
# q_embedding_near_dup is deliberately NOT in the sf10 family: it is the
# DECLARED O(n²) exactness baseline (4e10 dot products at 200k vectors on
# both engines) that the LSH/banded tiers are measured against — those
# scale tiers ARE in the family. Same reasoning as q_ppjoin in the text
# step: the compute is quadratic by declared semantics, not by defect.
# q_bfr_assign/q_bfr_stats (full-pipeline DuckDB unroll) are certified at
# sf1; the BFR driver loop's scale evidence is BfrScaleBench at 100M pts.

if [ ! -d "$SF10_DIR/embeddings.parquet" ]; then
  echo "== generating sf10 documents+embeddings at $SF10_DIR (100 key-offset copies of sf0.1)"
  sbt -batch "runMain graft.app.TestDataGen /root/testdata/sf0.1 $SF10_DIR 100 documents,embeddings"
else
  echo "== reusing existing sf10 embeddings at $SF10_DIR"
fi

echo "== Verify vector family at sf10 (200k vectors x 64d)"
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
# DuckDB's buffer manager + deep materialized-CTE chains exhaust the
# kernel's default mmap budget (vm.max_map_count=65530) on the 6×10⁷-row
# candidate relations here — malloc then fails on tiny blocks and
# pthread_create returns EAGAIN, both fatal. Raise it when permitted.
sysctl -w vm.max_map_count=1048576 2>/dev/null || \
  echo "   (could not raise vm.max_map_count — compare may abort on the largest relations)"
python3 - "$OUT_DIR" "$QUERIES" <<'EOF'
import json, sys
out_dir, queries = sys.argv[1], set(sys.argv[2].split(","))
o = json.load(open(f"{out_dir}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in queries},
          open(f"{out_dir}/oracle_sql.json", "w"))
EOF
CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-60GB}" \
CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-16}" \
CHECK_ORACLE_JSON="CORRECTNESS_sf10vec_r${ROUND}.json" \
  python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR"
