#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the testdata
parquet tables, sorts columns by name + rows by all columns, and
compares values cell-by-cell.
"""
import json
import math
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            spark_df = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            oracle_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} "
                  f"oracle={list(oracle_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(oracle_df)}")
            n_bad += 1
            continue
        # dtype-kind mismatch (e.g. DuckDB HUGEINT -> pandas float64 vs
        # Spark int64) hashes differently in the driver even when == holds
        # cell-by-cell in Python; treat it as a failure locally too.
        kind_bad = [
            (col, spark_df[col].dtype, oracle_df[col].dtype)
            for col in spark_df.columns
            if spark_df[col].dtype.kind != oracle_df[col].dtype.kind]
        if kind_bad:
            col, sk, ok = kind_bad[0]
            print(f"FAIL {name}: dtype mismatch col={col} spark={sk} oracle={ok}")
            n_bad += 1
            continue
        bad = None
        for col in spark_df.columns:
            sv, ov = spark_df[col].tolist(), oracle_df[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={col} row={i} "
                  f"spark={a!r} oracle={b!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows, "
                  f"{time.time() - t0:.1f}s oracle)", flush=True)
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
