#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB with views named after the sfDir
parquet tables, and compares row count, column names, and values
(column-name-sorted, row-sorted, NaN-safe). This is a pre-flight check only —
the real gate is driver-run.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def type_family(t: str) -> str:
    """Coarse type families AT THE GRAIN THE DRIVER HASHES: values pass
    through pandas before hashing, so types pandas normalizes together
    cannot drift there — DATE and TIMESTAMP both land as datetime64,
    DECIMAL lands as float64 (driver-green rows q19/q27/q31/q32/q40/q44
    pair Spark TIMESTAMP with oracle DATE, d29 pairs DOUBLE with
    DECIMAL). What CAN drift is int-vs-float ('5' vs '5.0') — the exact
    class that reached the driver in round 11 (q47 percentile_disc
    DOUBLE vs the oracle's BIGINT). Flag only cross-family pairings."""
    t = str(t).upper()
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return "list"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if (t in ("FLOAT", "REAL", "DOUBLE")
            or t.startswith("DECIMAL") or t.startswith("NUMERIC")):
        return "float"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "datetime"
    if t.startswith("STRUCT"):
        return "struct"
    if t == "BLOB":
        return "binary"
    return t  # BOOLEAN, VARCHAR, ... compare exactly


def dtype_mismatches(con, parquet_glob: str, sql: str):
    """Compare DuckDB logical types of the Spark parquet output vs the
    oracle query, per column name, at type-family grain. Routing BOTH
    sides through DuckDB's type system sidesteps pandas' null-driven
    int→float coercion, which would false-alarm on nullable ints."""
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{parquet_glob}')")
    oracle_rel = con.sql(sql)
    spark_t = dict(zip(spark_rel.columns,
                       [type_family(t) for t in spark_rel.types]))
    oracle_t = dict(zip(oracle_rel.columns,
                        [type_family(t) for t in oracle_rel.types]))
    return [f"col {c}: spark {spark_t[c]} != oracle {oracle_t[c]}"
            for c in sorted(set(spark_t) & set(oracle_t))
            if spark_t[c] != oracle_t[c]]


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(sql).df()
            bad_types = dtype_mismatches(
                con, f"{out_dir}/{name}/*.parquet", sql)
            if bad_types:
                raise AssertionError("dtype drift: " + "; ".join(bad_types))
            got_c, want_c = canon(got), canon(want)
            if list(got_c.columns) != list(want_c.columns):
                raise AssertionError(
                    f"columns {list(got_c.columns)} != {list(want_c.columns)}")
            if len(got_c) != len(want_c):
                raise AssertionError(f"rows {len(got_c)} != {len(want_c)}")
            for col in got_c.columns:
                ga, wa = got_c[col].tolist(), want_c[col].tolist()
                for i, (x, y) in enumerate(zip(ga, wa)):
                    # timestamps: pandas may give Timestamp vs datetime64
                    if hasattr(x, "to_pydatetime"):
                        x = x.to_pydatetime()
                    if hasattr(y, "to_pydatetime"):
                        y = y.to_pydatetime()
                    if not values_equal(x, y):
                        raise AssertionError(
                            f"col {col} row {i}: spark={x!r} duckdb={y!r}")
            print(f"PASS {name} ({len(got_c)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
