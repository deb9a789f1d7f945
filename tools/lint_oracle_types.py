#!/usr/bin/env python3
"""Oracle-SQL type lint — the guard for the defect class that shipped
hash-red in rounds 6 AND 7: a bare DuckDB sum() over an integral column
returns HUGEINT, which the driver's comparison pipeline reads as float64
while the Spark side emits BIGINT, so values hash-mismatch even when
numerically identical.

For every registered oracle we resolve the DuckDB result schema WITHOUT
executing the query (relation prepare is lazy) and compare it, column by
name-sorted column, against the Spark-side schema dumped by
OracleParitySpec. Any HUGEINT column, any name mismatch, or any
type-class mismatch (integral vs float vs string vs bool vs temporal vs
nested) fails the lint — and therefore `sbt test`.

Usage: lint_oracle_types.py <sf_dir> <oracle_sql.json> <spark_schema.json>
"""
import json
import sys

import duckdb

sf_dir, oracle_path, spark_schema_path = sys.argv[1], sys.argv[2], sys.argv[3]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(oracle_path))
spark_schemas = json.load(open(spark_schema_path))

INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def duck_class(t):
    t = str(t).upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"  # never acceptable: pandas reads it as float64
    if t.startswith("DECIMAL"):
        # Never acceptable either: depending on the duckdb/pandas
        # conversion DECIMAL can surface as object (decimal.Decimal)
        # rather than float64, reintroducing the hash-mismatch class
        # this lint exists to catch while reporting green.
        return "DECIMAL"
    if t in INTEGRAL:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t in ("VARCHAR", "UUID", "JSON"):
        # JSON reaches pandas as an object column, same as VARCHAR
        # (q_json_extract was hash-green in round 7 with this pairing)
        return "str"
    if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY")):
        return "nested"
    return t.lower()


def spark_class(t):
    t = t.lower()
    if t in ("byte", "short", "int", "bigint", "smallint", "tinyint", "long"):
        return "int"
    if t.startswith("decimal"):
        # parquet decimal128 reaches pandas as object (decimal.Decimal)
        # on the driver side too — same hazard as DuckDB DECIMAL.
        return "DECIMAL"
    if t in ("float", "double"):
        return "float"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "string":
        return "str"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return t


fails = []
for name in sorted(oracles):
    if name not in spark_schemas:
        fails.append((name, "oracle registered but no Spark schema dumped"))
        continue
    try:
        rel = con.sql(oracles[name])
        duck = list(zip(rel.columns, [str(t) for t in rel.types]))
    except Exception as e:  # noqa: BLE001 — any resolve failure is a red row
        fails.append((name, f"oracle SQL does not resolve: {e}"))
        continue
    spark = [(c, t) for c, t in spark_schemas[name]]
    d_cols, s_cols = sorted(c for c, _ in duck), sorted(c for c, _ in spark)
    if d_cols != s_cols:
        fails.append((name, f"columns differ: spark={s_cols} duckdb={d_cols}"))
        continue
    d_by, s_by = dict(duck), dict(spark)
    for c in d_cols:
        dc, sc = duck_class(d_by[c]), spark_class(s_by[c])
        if dc == "HUGEINT":
            fails.append((name, f"col '{c}' is HUGEINT ({d_by[c]}) — wrap the"
                          " oracle aggregate in CAST(... AS BIGINT)"))
        elif dc == "DECIMAL":
            fails.append((name, f"col '{c}' is DECIMAL ({d_by[c]}) — wrap the"
                          " oracle expression in CAST(... AS DOUBLE)"))
        elif sc == "DECIMAL":
            fails.append((name, f"col '{c}' is Spark decimal ({s_by[c]}) — "
                          "cast the Spark column to double"))
        elif dc != sc:
            fails.append((name, f"col '{c}' class mismatch: spark"
                          f" {s_by[c]} ({sc}) vs duckdb {d_by[c]} ({dc})"))

print(f"checked {len(oracles)} oracles; {len(fails)} failures")
for n, m in fails:
    print(f"  FAIL {n}: {m}")
sys.exit(1 if fails else 0)
