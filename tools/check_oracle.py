#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle comparison.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dump in verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir tables, sorts columns by name and rows by all
columns, and compares values (numeric tolerance 1e-6 relative).
"""
import json, math, sys
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

from decimal import Decimal

def norm(rows):
    # sort key: coarse string form (floats at 4dp) so both sides sort
    # identically; exact comparison happens value-wise with tolerance
    out = []
    for row in rows:
        nr = []
        for v in row:
            if isinstance(v, Decimal):
                v = float(v)
            nr.append(v)
        out.append(tuple(nr))
    def key(row):
        return tuple(
            (f"{v:.4f}" if math.isfinite(v) else str(v)) if isinstance(v, float)
            else str(v) for v in row)
    return sorted(out, key=key)

def close(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if not math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-6):
                    return False
            elif str(va) != str(vb):
                return False
    return True

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        cols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            f"SELECT {', '.join(cols)} FROM '{out_dir}/{name}/*.parquet'").fetchall()
        ora = con.sql(sql)
        ocols = sorted(ora.columns)
        if cols != ocols:
            print(f"FAIL {name}: columns spark={cols} oracle={ocols}")
            fails += 1
            continue
        ora_rows = con.sql(
            f"SELECT {', '.join(ocols)} FROM ({sql})").fetchall()
        a, b = norm(spark_rows), norm(ora_rows)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} oracle={len(b)}")
            fails += 1
        elif not close(a, b):
            bad = [(x, y) for x, y in zip(a, b)
                   if not close([x], [y])][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            fails += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle checks passed")
sys.exit(1 if fails else 0)
