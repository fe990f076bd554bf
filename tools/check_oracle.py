#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [verify_out_dir] [sf_dir]

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB with every testdata table
registered as a view, canonicalizes both sides (columns sorted by
name, rows sorted by all columns), and reports match/mismatch.
Dev tool only — not part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"COLUMN MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            sx = x.isoformat() if hasattr(x, "isoformat") else x
            sy = y.isoformat() if hasattr(y, "isoformat") else y
            if not values_equal(sx, sy):
                return f"VALUE MISMATCH col={col} row={i}: spark={x!r} oracle={y!r}"
    return None


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.loads((out_dir / "oracle_sql.json").read_text())
    errors_path = out_dir / "_errors.json"
    verify_errors = json.loads(errors_path.read_text()) if errors_path.exists() else {}

    results = {}
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        if name in verify_errors:
            results[name] = f"SPARK QUERY FAILED: {verify_errors[name]}"
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            results[name] = f"SPARK READ FAILED: {e}"
            continue
        if name not in oracle_sql:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            oracle_df = con.sql(oracle_sql[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL FAILED: {e}"
            continue
        err = compare(name, spark_df, oracle_df)
        results[name] = err if err else f"OK ({len(spark_df)} rows)"

    missing = set(oracle_sql) - set(results)
    for m in missing:
        results[m] = "NO SPARK OUTPUT (query failed in Verify?)"
    width = max(len(n) for n in results)
    n_bad = 0
    for name in sorted(results):
        status = results[name]
        bad = not (status.startswith("OK") or status.startswith("rows-only"))
        n_bad += bad
        print(f"{'FAIL' if bad else 'ok  '} {name:<{width}} {status}")
    print(f"\n{len(results) - n_bad}/{len(results)} passing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
