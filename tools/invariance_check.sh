#!/usr/bin/env bash
# Parallelism-invariance check: the same query list run at local[32] and
# local[4] must produce IDENTICAL results (sorted compare). This is the
# cluster-determinism proxy the money-sum family failed implicitly at
# sf10 before r13's exact-integer-cents fix: an order-dependent
# round(sum(double)) changes with the partial-aggregation tree, i.e.
# with parallelism, i.e. between any two runs of a real cluster.
#
# r14 revision: Verify runs as a direct `java -cp` JVM (no sbt lock —
# safe alongside a running gate) and the compare can write a
# machine-readable artifact (4th arg), e.g. INVARIANCE_sf10_r14.json.
#
# Usage: tools/invariance_check.sh <sf_dir> <queries_csv> [out_root] [json_out]
# Exit 0 iff every query's two dumps are row-set identical.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?usage: tools/invariance_check.sh <sf_dir> <queries_csv> [out_root] [json_out]}"
QUERIES="${2:?query list (comma-separated)}"
OUT_ROOT="${3:-/tmp/invariance_check}"
JSON_OUT="${4:-}"

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

rm -rf "$OUT_ROOT"
for CPUS in 32 4; do
  echo "== [$(date +%H:%M:%S)] Verify at local[$CPUS]"
  LOG="$(mktemp /tmp/graft_inv_log.XXXXXX)"
  # own spark.local.dir: isolated from any concurrent gate's cleanup
  LOCAL_DIR="/tmp/inv_check_local_$CPUS"
  rm -rf "$LOCAL_DIR"; mkdir -p "$LOCAL_DIR"
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=$CPUS \
    java -cp "$CP" $ADD_OPENS $JFLAGS -Dspark.local.dir="$LOCAL_DIR" \
      -Djava.io.tmpdir="$LOCAL_DIR" \
      -Xmx"${SPARK_DRIVER_MEM:-16g}" \
      graft.Verify "$SF_DIR" "$OUT_ROOT/cpus$CPUS" "$QUERIES" \
    >"$LOG" 2>&1 \
    || { tail -n 40 "$LOG"; echo "Verify failed at local[$CPUS]"; exit 1; }
  rm -rf "$LOCAL_DIR"
  if grep "\[verify\]" "$LOG"; then
    echo "Verify reported per-query failures at local[$CPUS]"; exit 1
  fi
done

echo "== comparing local[32] vs local[4] dumps"
python3 - "$OUT_ROOT" "$SF_DIR" "$JSON_OUT" <<'EOF'
import glob, json, sys
import pandas as pd

root, sf_dir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
names = sorted(p.split("/")[-1] for p in glob.glob(f"{root}/cpus32/q_*"))
assert names, f"no dumps under {root}/cpus32"
bad, good = [], {}
for name in names:
    def load(c):
        fs = glob.glob(f"{root}/cpus{c}/{name}/*.parquet")
        df = pd.concat([pd.read_parquet(p) for p in fs], ignore_index=True)
        df = df[sorted(df.columns)]
        for col in df.columns:
            if df[col].dtype == object:
                df[col] = df[col].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = load(32), load(4)
    if len(a) != len(b):
        bad.append((name, f"row count {len(a)} vs {len(b)}"))
        continue
    if not a.equals(b):
        neq = None
        for col in a.columns:
            m = a[col].ne(b[col]) & ~(a[col].isna() & b[col].isna())
            if m.any():
                i = int(m.idxmax())
                neq = f"col={col} row={i}: {a[col][i]!r} vs {b[col][i]!r}"
                break
        bad.append((name, neq or "frame mismatch"))
    else:
        good[name] = len(a)
        print(f"  {name}: IDENTICAL ({len(a)} rows)")
if json_out:
    json.dump({"sf_dir": sf_dir, "cpus": [32, 4],
               "n_invariant": len(good), "n_variant": len(bad),
               "invariant_rows": good,
               "variant": {n: m for n, m in bad}},
              open(json_out, "w"), indent=1)
    print(f"wrote {json_out}")
if bad:
    print("PARALLELISM-VARIANT QUERIES:")
    for n, m in bad:
        print(f"  {n}: {m}")
    sys.exit(1)
print(f"all {len(names)} queries parallelism-invariant")
EOF
