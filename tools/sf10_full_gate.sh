#!/usr/bin/env bash
# FULL-REGISTRY sf10 correctness gate — r14 revision: ONE unattended
# run that ends in a consolidated CORRECTNESS_sf10_r<N>.json (the r13
# run certified 202/202 cumulatively but fragmented across manual
# retries and never executed its merge step).
#
# r14 structural changes (each closes a named r13 failure):
#  * Verify runs as a direct `java -cp` JVM (no sbt): no recompile
#    mid-gate, no sbt lock, exact -Xmx control per phase.
#  * The old "rest" phase is split media_image / media_audio /
#    media_video / olap — one JVM no longer accumulates EVERY media
#    family's memoized decoded-corpus localCheckpoints and then runs
#    connected components on top (that single-JVM heap pile-up OOM'd
#    the 24 GB driver at q_image_dedup_groups in r13).
#  * CHECK_ORACLE_SCALE=1: the four media groups/curation oracles and
#    q_embedding_dedup_groups consume the just-verified near-dup pair
#    dumps (dump_q_* views) instead of re-deriving band self-joins —
#    the r13 DuckDB OOM/solo-retry class.
#  * Stale /tmp/sf10_phase_*.json are removed up front and every
#    compare must leave a non-empty phase JSON (r13 ADVICE: '|| true'
#    could merge a PREVIOUS round's artifact).
#  * An OOM'd/failed oracle is retried once, solo, while the phase's
#    dumps are still on disk (CHECK_ORACLE_ONLY) before being declared
#    failed.
#  * A trap merges whatever phase JSONs exist even on abort, marking
#    the artifact "complete": false — a crashed run still leaves one
#    machine-readable record instead of six /tmp files.
#
# Declared-semantics exclusions (named, bounded — both O(n²)-by-
# definition baselines, reasons documented in the targeted r11 scripts):
#   q_ppjoin            — exact answer relation is ~2e10 rows at 500k
#                         docs; digest-certified at sf1; the bounded
#                         q_ppjoin_pairs stratum IS in this gate.
#   q_embedding_near_dup — the DECLARED O(n²) exactness baseline
#                         (4e10 dot products at 200k vectors); the
#                         LSH/banded scale tiers ARE in this gate.
#
# Usage: tools/sf10_full_gate.sh <round> [sf10_dir] [out_dir]
# Writes CORRECTNESS_sf10_r<N>.json at the repo root.
# Requires `sbt compile` to be CURRENT (runs target/scala-2.13/classes).
# Do NOT run concurrently with other memory-heavy work.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/sf10_full_gate.sh <round> [sf10_dir] [out_dir]}"
SF10_DIR="${2:-/tmp/testdata_sf10}"
OUT_DIR="${3:-/tmp/verify_sf10_full}"
EXCLUDE="q_ppjoin,q_embedding_near_dup"
PHASES="text vector media_image media_audio media_video olap"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
[ -f target/scala-2.13/classes/graft/Verify.class ] || {
  echo "pre-flight: target/scala-2.13/classes is missing graft.Verify — run 'sbt compile' first"; exit 1; }

# JDK17 module opens Spark 4 needs outside spark-submit (same list as
# build.sbt's jdk17AddOpens).
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

# Disk budget as a CONTRACT, not a discovery (the r12 run hit
# disk-full twice live): require enough free space up front for one
# phase's Verify dumps plus the DuckDB spill budget. Dumps are deleted
# after each phase's compare below, so the bound is per-phase.
MIN_FREE_GB="${MIN_FREE_GB:-80}"
FREE_GB=$(df --output=avail -B1G /tmp | tail -1 | tr -d ' ')
if [ "$FREE_GB" -lt "$MIN_FREE_GB" ]; then
  echo "pre-flight: only ${FREE_GB} GB free on /tmp (need ${MIN_FREE_GB} GB) — clean the box first"
  exit 1
fi

# Stale-artifact hygiene (r13 ADVICE): a previous round's phase JSONs
# must never survive into this run's merge.
rm -f /tmp/sf10_phase_*.json

if [ ! -d "$SF10_DIR/lineitem.parquet" ]; then
  echo "== generating remaining sf10 tables at $SF10_DIR (100 key-offset copies of sf0.1)"
  # shellcheck disable=SC2086
  java -cp "$CP" $ADD_OPENS $JFLAGS -Xmx24g graft.app.TestDataGen \
    /root/testdata/sf0.1 "$SF10_DIR" 100 \
    customer,supplier,part,orders,lineitem,events,documents,embeddings
else
  echo "== reusing existing sf10 tables at $SF10_DIR"
fi

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
# media phases: one JVM per decode family so no heap accumulates every
# family's memoized feature artifacts (the r13 rest-phase OOM).
MEDIA_IMG="q_image_dhash,q_image_near_dup,q_image_dedup_groups,q_gif_dhash"
MEDIA_IMG+=",q_cross_codec_dups,q_jpeg_dhash,q_jpeg_quarantine,q_jpeg_progressive_dhash"
MEDIA_AUD="q_audio_meta,q_audio_features,q_audio_fingerprint,q_audio_near_dup"
MEDIA_AUD+=",q_audio_dedup_groups,q_audio_formats,q_multimodal_curation"
MEDIA_VID="q_video_meta,q_video_keyframes,q_video_fingerprint,q_video_near_dup"
MEDIA_VID+=",q_video_dedup_groups,q_video_kf_dhash,q_video_scene_cuts"

rm -rf "$OUT_DIR"
# see tools/sf10_vector_gate.sh for the vm.max_map_count rationale
sysctl -w vm.max_map_count=1048576 2>/dev/null || \
  echo "   (could not raise vm.max_map_count — compare may abort on the largest relations)"

merge() {
  # Merge every phase JSON present into the round artifact. Runs on
  # normal completion AND from the abort trap (then complete=false).
  python3 - "$ROUND" "$SF10_DIR" "$EXCLUDE" "$PHASES" <<'EOF'
import json, os, sys
round_, sf_dir, excl = sys.argv[1], sys.argv[2], sorted(sys.argv[3].split(","))
phases = sys.argv[4].split()
merged = {"sf_dir": sf_dir, "complete": True, "phases_present": [],
          "phases_missing": [], "n_pass": 0, "n_fail": 0, "n_rows_only": 0,
          "n_skipped": len(excl), "pass": [], "rows_only": {},
          "skipped": excl, "fail": {}, "scale_oracle": [], "retried": []}
for label in phases:
    fp = f"/tmp/sf10_phase_{label}.json"
    if not os.path.exists(fp):
        merged["complete"] = False
        merged["phases_missing"].append(label)
        continue
    p = json.load(open(fp))
    merged["phases_present"].append(label)
    merged["pass"] += p["pass"]
    merged["rows_only"].update(p["rows_only"])
    merged["fail"].update(p["fail"])
    merged["scale_oracle"] += p.get("scale_oracle", [])
    merged["retried"] += p.get("retried", [])
merged["pass"] = sorted(set(merged["pass"]))
merged["scale_oracle"] = sorted(set(merged["scale_oracle"]))
merged["retried"] = sorted(set(merged["retried"]))
merged["n_pass"] = len(merged["pass"])
merged["n_fail"] = len(merged["fail"])
merged["n_rows_only"] = len(merged["rows_only"])
out = f"CORRECTNESS_sf10_r{round_}.json"
json.dump(merged, open(out, "w"), indent=1)
print(f"wrote {out}: {merged['n_pass']} pass / {merged['n_fail']} fail "
      f"/ {merged['n_skipped']} excluded / complete={merged['complete']}")
sys.exit(1 if merged["fail"] or not merged["complete"] else 0)
EOF
}
# On ANY non-zero exit before the final merge, still consolidate the
# phase JSONs written so far (complete=false) — a crashed run leaves
# one machine-readable artifact instead of six /tmp files.
MERGED=0
trap 'rc=$?; if [ "$rc" -ne 0 ] && [ "$MERGED" = 0 ]; then
        echo "== gate aborted (rc=$rc) — merging partial phase artifacts";
        merge || true; fi' EXIT

run_phase() {
  local SPEC="$1" LABEL="$2" MEM="${3:-${SPARK_DRIVER_MEM:-24g}}" KEEP="${4:-}"
  echo "== [$(date +%H:%M:%S)] phase $LABEL: Verify (java -Xmx$MEM)"
  VERIFY_LOG="$(mktemp /tmp/graft_verify_log.XXXXXX)"
  # Per-phase spark.local.dir: shuffle/localCheckpoint data is isolated
  # so the post-phase cleanup deletes exactly THIS JVM's storage — a
  # bare `rm -rf /tmp/blockmgr-*` deleted a CONCURRENT Verify's live
  # shuffle files mid-run (observed live: the r14 sf1 gate died on
  # FileNotFoundException temp_shuffle while this gate's text phase
  # cleaned up).
  local LOCAL_DIR="/tmp/sf10_gate_local_${LABEL}"
  rm -rf "$LOCAL_DIR"; mkdir -p "$LOCAL_DIR"
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=32 \
    java -cp "$CP" $ADD_OPENS $JFLAGS -Dspark.local.dir="$LOCAL_DIR" \
      -Xmx"$MEM" graft.Verify \
      "$SF10_DIR" "$OUT_DIR" "$SPEC" >"$VERIFY_LOG" 2>&1 \
    || { tail -n 60 "$VERIFY_LOG"; echo "Verify exited non-zero (phase $LABEL)"; exit 1; }
  if grep "\[verify\]" "$VERIFY_LOG"; then
    echo "Verify reported per-query failures (phase $LABEL)"; exit 1
  fi
  rm -rf "$LOCAL_DIR" 2>/dev/null || true

  # Per-query compare under an explicit memory/spill budget; composed
  # scale oracles (CHECK_ORACLE_SCALE) read the dump_q_* views.
  echo "== [$(date +%H:%M:%S)] phase $LABEL: DuckDB compare"
  local PHASE_JSON="/tmp/sf10_phase_${LABEL}.json"
  # compare ONLY this phase's queries: a kept cross-phase pair dump
  # (still on disk for a later composed oracle) must not be re-compared
  local ONLY_LIST=""
  case "$SPEC" in all-but:*) ;; *) ONLY_LIST="$SPEC" ;; esac
  CHECK_ORACLE_ONLY="$ONLY_LIST" \
  CHECK_ORACLE_VERBOSE="${CHECK_ORACLE_VERBOSE:-1}" \
  CHECK_ORACLE_PER_QUERY=1 \
  CHECK_ORACLE_SCALE=1 \
  CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-48GB}" \
  CHECK_ORACLE_SPILL_MAX="${CHECK_ORACLE_SPILL_MAX:-60GB}" \
  CHECK_ORACLE_MIN_FREE_GB="${CHECK_ORACLE_MIN_FREE_GB:-40}" \
  CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-16}" \
  CHECK_ORACLE_JSON="$PHASE_JSON" \
    python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR" \
    || true  # per-query fails are retried below, then tallied
  # The compare must have WRITTEN its artifact — a checker crash that
  # exits before the JSON (disk pre-flight, OOM-kill) must fail the
  # gate loudly, not let the merge read a stale file (r13 ADVICE).
  [ -s "$PHASE_JSON" ] || {
    echo "phase $LABEL: compare left no artifact at $PHASE_JSON — aborting"; exit 1; }

  # Solo retry of any failed oracles while the dumps are still on disk:
  # r13's six media-oracle fails all passed on retry with the box
  # otherwise idle; give an OOM'd oracle one clean second chance before
  # declaring the round red.
  local RETRY_LIST
  RETRY_LIST=$(python3 -c "import json,sys; print(','.join(sorted(json.load(open('$PHASE_JSON'))['fail'])))")
  if [ -n "$RETRY_LIST" ]; then
    echo "== [$(date +%H:%M:%S)] phase $LABEL: solo retry of: $RETRY_LIST"
    CHECK_ORACLE_VERBOSE=1 \
    CHECK_ORACLE_PER_QUERY=1 \
    CHECK_ORACLE_SCALE=1 \
    CHECK_ORACLE_MEMLIMIT="${CHECK_ORACLE_MEMLIMIT:-48GB}" \
    CHECK_ORACLE_SPILL_MAX="${CHECK_ORACLE_SPILL_MAX:-60GB}" \
    CHECK_ORACLE_THREADS="${CHECK_ORACLE_THREADS:-16}" \
    CHECK_ORACLE_ONLY="$RETRY_LIST" \
    CHECK_ORACLE_JSON="${PHASE_JSON%.json}_retry.json" \
      python3 tools/check_oracle.py "$SF10_DIR" "$OUT_DIR" || true
    python3 - "$PHASE_JSON" <<'EOF'
import json, os, sys
pj = sys.argv[1]
rj = pj[:-5] + "_retry.json"
p = json.load(open(pj))
if os.path.exists(rj):
    r = json.load(open(rj))
    rescued = [n for n in r["pass"] if n in p["fail"]]
    for n in rescued:
        del p["fail"][n]
        p["pass"].append(n)
    p["fail"].update(r["fail"])  # keep the freshest failure message
    p["pass"] = sorted(set(p["pass"]))
    p["n_pass"], p["n_fail"] = len(p["pass"]), len(p["fail"])
    p["retried"] = sorted(set(p.get("retried", [])) | set(r["pass"]) | set(r["fail"]))
    json.dump(p, open(pj, "w"), indent=1)
    print(f"retry rescued {len(rescued)}: {' '.join(rescued)}; "
          f"still failing: {len(p['fail'])}")
else:
    print("retry left no artifact — keeping original phase verdicts")
EOF
  fi

  # Delete this phase's dumps except cross-phase keeps (verified pair
  # dumps a LATER phase's composed oracle consumes — tiny survivor
  # relations, no disk concern).
  local d qn keep
  for d in "$OUT_DIR"/q_*; do
    [ -e "$d" ] || continue
    qn="$(basename "$d")"
    keep=0
    if [ -n "$KEEP" ]; then
      case ",$KEEP," in *",$qn,"*) keep=1;; esac
    fi
    [ "$keep" = 1 ] || rm -rf "$d"
  done
}

run_phase "$TEXTQ" "text"
run_phase "$VECQ" "vector"
# q_image_near_dup's verified dump feeds q_multimodal_curation's
# composed oracle in the NEXT phase — keep it until then.
run_phase "$MEDIA_IMG" "media_image" "${SPARK_DRIVER_MEM_MEDIA:-32g}" "q_image_near_dup"
run_phase "$MEDIA_AUD" "media_audio" "${SPARK_DRIVER_MEM_MEDIA:-32g}"
run_phase "$MEDIA_VID" "media_video" "${SPARK_DRIVER_MEM_MEDIA:-32g}"
run_phase "all-but:$EXCLUDE,$TEXTQ,$VECQ,$MEDIA_IMG,$MEDIA_AUD,$MEDIA_VID" "olap"

MERGED=1
echo "== [$(date +%H:%M:%S)] merging phase artifacts"
merge
