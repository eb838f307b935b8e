"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bertseyeview_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def dtype_kinds(df: pd.DataFrame) -> dict:
    """Coarse per-column kind; the driver's hash is representation-sensitive,
    so an int64-vs-object(int128) or int-vs-float divergence that stringifies
    identically still hash-fails at the driver. Surface it here."""
    kinds = {}
    for c in sorted(df.columns):
        d = df[c]
        if pd.api.types.is_datetime64_any_dtype(d):
            kinds[c] = "ts"
        elif pd.api.types.is_float_dtype(d):
            kinds[c] = "float"
        elif pd.api.types.is_integer_dtype(d):
            kinds[c] = "int"
        elif pd.api.types.is_bool_dtype(d):
            kinds[c] = "bool"
        else:
            kinds[c] = str(d.dtype)
    return kinds


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda x: "nan" if x is None or (isinstance(x, float) and math.isnan(x))
                else f"{x:.10g}"
            )
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        ka, kb = dtype_kinds(sdf), dtype_kinds(odf)
        kind_warn = {
            c: (ka.get(c), kb.get(c))
            for c in set(ka) | set(kb)
            if ka.get(c) != kb.get(c)
        }
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            failures.append(name)
            print(f"[FAIL] {name}: {int(diff.sum())}/{len(a)} mismatched rows")
            ix = diff[diff].index[:3]
            for i in ix:
                print("  spark :", a.loc[i].to_dict())
                print("  oracle:", b.loc[i].to_dict())
            continue
        if kind_warn:
            failures.append(name)
            print(f"[FAIL] {name}: dtype-kind mismatch (driver hash risk): "
                  f"{kind_warn}")
            continue
        print(f"[OK]   {name}: {len(a)} rows")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
