#!/usr/bin/env python3
"""Parallelism/run invariance check: compare two graft.Verify output dirs
content-wise (columns sorted by name, rows sorted by value, exact cell
equality) — partition layout and file count are allowed to differ, the
relational content is not. Usage: diff_verify.py <outDirA> <outDirB>"""
import glob, sys

import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]


def canon(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


names_a = {p.split("/")[-1] for p in glob.glob(f"{a_dir}/q_*")}
names_b = {p.split("/")[-1] for p in glob.glob(f"{b_dir}/q_*")}
if names_a != names_b:
    print(f"REGISTRY MISMATCH: only-in-A={sorted(names_a - names_b)} "
          f"only-in-B={sorted(names_b - names_a)}")
    sys.exit(1)

fails, passes = [], []
for name in sorted(names_a):
    try:
        ga, gb = canon(a_dir, name), canon(b_dir, name)
        if list(ga.columns) != list(gb.columns):
            fails.append((name, f"columns {list(ga.columns)} vs {list(gb.columns)}"))
        elif len(ga) != len(gb):
            fails.append((name, f"rows {len(ga)} vs {len(gb)}"))
        elif not ga.equals(gb):
            neq = (ga != gb) & ~(ga.isna() & gb.isna())
            col = [c for c in ga.columns if neq[c].any()][0]
            i = neq[col].idxmax()
            fails.append((name, f"cell [{i}][{col}]: {ga[col][i]!r} vs {gb[col][i]!r}"))
        else:
            passes.append(name)
    except Exception as e:
        fails.append((name, f"read error: {e}"))

print(f"PASS ({len(passes)})")
print(f"FAIL ({len(fails)}):")
for n, why in fails:
    print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
