"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Env: SPARK_GRAFT_ORACLE_JSON=<path> also writes a per-query JSON artifact
(the full-surface correctness record committed each round — the driver's
own CORRECTNESS file caps at 50 rows, this one covers every query).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # int-like: normalize to int64 where possible
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from temporalscope_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = records[name] = {
            "rows_match": False, "schema_match": False, "values_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spark_pdf)
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            rec["err"] = f"spark error: {e}"
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rec["err"] = "no oracle (rows-only check)"
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)})")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
            rec["oracle_rows"] = len(duck_pdf)
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            rec["err"] = f"duckdb error: {e}"
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"))
            rec["err"] = f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
            print(f"FAIL {name}: schema {list(a.columns)} vs {list(b.columns)}")
            continue
        rec["schema_match"] = True
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} vs {len(b)}"))
            rec["err"] = f"rowcount {len(a)} vs {len(b)}"
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            continue
        rec["rows_match"] = True
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-5, atol=1e-6)
            rec["values_match"] = True
            print(f"OK   {name}: {len(a)} rows")
        except AssertionError as e:
            failures.append((name, str(e).splitlines()[0]))
            rec["err"] = f"values differ: {str(e).splitlines()[0]}"
            print(f"FAIL {name}: values differ: {str(e).splitlines()[:3]}")
    out_json = os.environ.get("SPARK_GRAFT_ORACLE_JSON")
    if out_json:
        import json

        with open(out_json, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": records}, fh, indent=1)
        print(f"wrote {out_json} ({len(records)} queries)")
    print(f"\n{len(failures)} failures / {len([n for n in qs if not only or n in only])} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
