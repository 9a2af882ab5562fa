"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, schema (sorted column names), and
an order-insensitive value comparison.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from vcfdbr_spark import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only check) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        status = []
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} vs {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA {list(got.columns)} vs {list(want.columns)}")
        if not status:
            if got.shape == want.shape:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=True
                    )
                except AssertionError as ex:
                    status.append(f"VALUES {str(ex).splitlines()[-1][:160]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(
                f"PASS {name}: rows={len(got)} cols={len(got.columns)} "
                f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
