#!/usr/bin/env python3
"""Dev-only local twin of the driver's t2 correctness gate.

Reads the Verify dump (<outDir>/<name> parquet dirs + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir's parquet tables, and
hash-compares values with columns sorted by name (mirroring the driver).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # sort rows by all columns for order-insensitive compare
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # the dump dual-keys every SQL as both <name> and <name>.parquet (driver
    # lookup-convention insurance); normalize to bare names here
    oracle = {(k[:-len(".parquet")] if k.endswith(".parquet") else k): v
              for k, v in oracle.items()}
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA: spark={list(s.columns)} duck={list(d.columns)}"
        elif len(s) != len(d):
            results[name] = f"ROWS: spark={len(s)} duck={len(d)}"
        else:
            # dtype KINDS must agree before values are compared (r5 lesson:
            # DuckDB's HUGEINT sum landed as float64 against Spark's int64 —
            # every value identical, but the driver's rendering-sensitive
            # hash sees "31.0" vs "31" and fails, while check_dtype=False
            # hid it locally). Width differences within a kind (int32 vs
            # int64) render identically and stay allowed.
            kinds_s = [s.dtypes[c].kind for c in s.columns]
            kinds_d = [d.dtypes[c].kind for c in d.columns]
            if kinds_s != kinds_d:
                results[name] = (
                    f"DTYPE: spark={[str(t) for t in s.dtypes]} "
                    f"duck={[str(t) for t in d.dtypes]}")
                continue
            try:
                import pandas.testing as pdt
                pdt.assert_frame_equal(s, d, check_dtype=False,
                                       check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "VALUES: " + str(e).replace("\n", " | ")[:400]
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + v))
    print(f"== {n_ok}/{len(results)} oracle-checked queries match")
    # rows-only entries (no oracle): report row counts
    import os
    for p in sorted(glob.glob(f"{out_dir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        if os.path.isdir(p) and name not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = con.execute(f"SELECT COUNT(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
            print(f"ROWS-ONLY {name}: {n} rows")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
