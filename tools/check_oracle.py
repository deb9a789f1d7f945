#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: for each query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name and rows by value, and diff."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Per-RUN spill subdirectory under the configured root: a fixed shared
# path meant (a) one run's post-query rmtree deleted a CONCURRENT run's
# live DuckDB temp files, and (b) pointing CHECK_ORACLE_SPILL_DIR at a
# non-dedicated path recursively deleted it (r13 ADVICE). Only this
# run's own subdir is ever cleaned.
SPILL_ROOT = os.environ.get("CHECK_ORACLE_SPILL_DIR", "/tmp/duckdb_spill")
os.makedirs(SPILL_ROOT, exist_ok=True)
import tempfile, atexit, shutil
SPILL_DIR = tempfile.mkdtemp(prefix="run.", dir=SPILL_ROOT)
atexit.register(lambda: shutil.rmtree(SPILL_DIR, ignore_errors=True))


def fresh_con():
    """One configured DuckDB session. In per-query mode (below) each
    oracle gets its own — a closed session provably releases every
    pipeline buffer and temp file, so one oracle's spill can never
    starve the next (the sf10 r12 failure mode: 7 oracles died on the
    SHARED session's accumulated memory/temp)."""
    c = duckdb.connect()
    # Optional memory cap (e.g. CHECK_ORACLE_MEMLIMIT=48GB): DuckDB then
    # spills oversized operators to a temp directory instead of growing
    # resident — scaled-gate insurance so one oracle can't take down
    # concurrent work.
    if os.environ.get("CHECK_ORACLE_MEMLIMIT"):
        c.sql(f"SET memory_limit = '{os.environ['CHECK_ORACLE_MEMLIMIT']}'")
        os.makedirs(SPILL_DIR, exist_ok=True)
        c.sql(f"SET temp_directory = '{SPILL_DIR}'")
        # Spill-disk budget as a CONTRACT (e.g. CHECK_ORACLE_SPILL_MAX=
        # 60GB): without it DuckDB fills the device and every CONCURRENT
        # writer on the box fails too (observed live at the r12 gate).
        if os.environ.get("CHECK_ORACLE_SPILL_MAX"):
            c.sql("SET max_temp_directory_size = "
                  f"'{os.environ['CHECK_ORACLE_SPILL_MAX']}'")
    # Optional worker-thread cap (e.g. CHECK_ORACLE_THREADS=16): at the
    # sf10 gates DuckDB's default (one thread per CPU) plus deep
    # materialized-CTE chains can fail pthread_create with EAGAIN mid-run
    # (thread stacks compete with the buffer pool for address space);
    # capping threads keeps long multi-query compares stable at a small
    # wall-clock cost.
    if os.environ.get("CHECK_ORACLE_THREADS"):
        c.sql(f"SET threads = {int(os.environ['CHECK_ORACLE_THREADS'])}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver layout = single file; TestDataGen layout = directory of
        # parts. Missing tables are skipped (targeted scale steps generate
        # a subset; an oracle that needs an absent table then fails loudly
        # per-query).
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    if scale_mode:
        # Scaled-gate composition (CHECK_ORACLE_SCALE=1): expose each
        # engine dump as dump_q_<name> so a scale oracle can consume a
        # relation the SAME gate run verifies against its base oracle
        # (e.g. groups := CC over the verified near-dup pair dump)
        # instead of re-deriving a ~1e9-row intermediate inside DuckDB.
        for qdir in glob.glob(f"{out_dir}/q_*"):
            qn = qdir.split("/")[-1]
            if glob.glob(f"{qdir}/*.parquet"):
                c.sql(f"CREATE VIEW dump_{qn} AS SELECT * "
                      f"FROM '{qdir}/*.parquet'")
    return c


# CHECK_ORACLE_PER_QUERY=1: fresh session (and clean spill dir) per
# oracle — the scaled-gate mode. Default: one shared session (fast).
per_query = os.environ.get("CHECK_ORACLE_PER_QUERY", "") == "1"

# CHECK_ORACLE_SCALE=1: overlay oracle_sql_scale.json (cheaper composed
# twins) onto the base oracles and register dump_q_* views.
scale_mode = os.environ.get("CHECK_ORACLE_SCALE", "") == "1"

# Pre-flight disk contract (CHECK_ORACLE_MIN_FREE_GB, default 20 when a
# memory limit/spill is configured): fail BEFORE the first query if the
# spill device can't hold a realistic spill, instead of dying at query
# 113 of 201 three hours in.
min_free_gb = float(os.environ.get("CHECK_ORACLE_MIN_FREE_GB",
                                   "20" if os.environ.get("CHECK_ORACLE_MEMLIMIT") else "0"))
if min_free_gb > 0:
    import shutil
    os.makedirs(SPILL_DIR, exist_ok=True)
    free_gb = shutil.disk_usage(SPILL_DIR).free / 1e9
    if free_gb < min_free_gb:
        sys.exit(f"pre-flight: only {free_gb:.1f} GB free on {SPILL_DIR} "
                 f"(need {min_free_gb:.0f} GB) — clean the box first")

con = None if per_query else fresh_con()

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
scale_used = []
if scale_mode:
    sp = f"{out_dir}/oracle_sql_scale.json"
    if os.path.exists(sp):
        overlay = json.load(open(sp))
        oracles.update(overlay)
        scale_used = sorted(overlay.keys())
        print(f"scale-oracle overlay active for: {' '.join(scale_used)}")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

verbose = os.environ.get("CHECK_ORACLE_VERBOSE", "") == "1"
# CHECK_ORACLE_SKIP: comma-separated names whose ORACLE is infeasible at
# the current SF (e.g. q_ppjoin at sf1: the answer itself is ~2e8 pairs on
# the dense-vocab corpus and any exact oracle needs an ~3e10-row join);
# skipped queries are reported, never silently dropped.
skip = set(filter(None, os.environ.get("CHECK_ORACLE_SKIP", "").split(",")))
# CHECK_ORACLE_ONLY: comma-separated names — compare ONLY these (the
# scaled gate's solo-retry path re-checks just the failed queries while
# every dump is still on disk). Unlisted dumps are ignored, not tallied.
only = set(filter(None, os.environ.get("CHECK_ORACLE_ONLY", "").split(",")))
skipped = []
fails, passes, rows_only = [], [], []
for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
    name = qdir.split("/")[-1]
    if only and name not in only:
        continue
    if name in skip:
        skipped.append(name)
        continue
    if verbose:
        import time
        print(f"[{time.strftime('%H:%M:%S')}] {name}", flush=True)
    got = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")],
                    ignore_index=True)
    if name not in oracles:
        rows_only.append((name, len(got)))
        continue
    try:
        if per_query:
            qcon = fresh_con()
            try:
                exp = qcon.sql(oracles[name]).df()
            finally:
                qcon.close()
                # reclaim any spill the session left behind before the
                # next query sizes its own budget
                import shutil as _sh
                _sh.rmtree(SPILL_DIR, ignore_errors=True)
        else:
            exp = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns differ: spark={list(g.columns)} duckdb={list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"row count differs: spark={len(g)} duckdb={len(e)}"))
        continue
    mismatch = None
    for c in g.columns:
        a, b = g[c], e[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            bad = ~(np.isclose(aa, bb, rtol=0, atol=0, equal_nan=True))
            # exact compare (driver hashes); report near-misses distinctly
            if bad.any():
                close = np.isclose(aa, bb, rtol=1e-9, atol=1e-9, equal_nan=True)
                kind = "EXACT-mismatch-but-close" if close[bad].all() else "value mismatch"
                i = int(np.argmax(bad))
                mismatch = f"{kind} col={c} row={i}: spark={a[i]!r} duckdb={b[i]!r}"
                break
        else:
            if not a.astype(str).equals(b.astype(str)):
                i = (a.astype(str) != b.astype(str)).idxmax()
                mismatch = f"value mismatch col={c} row={i}: spark={a[i]!r} duckdb={b[i]!r}"
                break
    if mismatch:
        fails.append((name, mismatch))
    else:
        passes.append(name)

print(f"PASS ({len(passes)}):", " ".join(passes))
if skipped:
    print(f"SKIPPED ({len(skipped)}):", " ".join(skipped))
print(f"ROWS-ONLY ({len(rows_only)}):", " ".join(f"{n}={r}" for n, r in rows_only))
print(f"FAIL ({len(fails)}):")
for n, m in fails:
    print(f"  {n}: {m}")

# CHECK_ORACLE_JSON: write a machine-readable per-query artifact (the
# standing-gate record, e.g. CORRECTNESS_sf1_r11.json)
json_out = os.environ.get("CHECK_ORACLE_JSON", "")
if json_out:
    with open(json_out, "w") as f:
        json.dump({
            "sf_dir": sf_dir,
            "n_pass": len(passes), "n_fail": len(fails),
            "n_rows_only": len(rows_only), "n_skipped": len(skipped),
            "pass": sorted(passes),
            "rows_only": {n: r for n, r in rows_only},
            "skipped": sorted(skipped),
            "fail": {n: m for n, m in fails},
            # queries whose verdict used the composed scale oracle (their
            # certification is CONDITIONAL on the referenced dump queries
            # passing their base oracles in the same artifact)
            "scale_oracle": [n for n in scale_used
                             if n in passes or any(f[0] == n for f in fails)],
        }, f, indent=1)
    print(f"wrote {json_out}")
sys.exit(1 if fails else 0)
