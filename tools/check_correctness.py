"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, schema (sorted column names), and
an order-insensitive value comparison.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

``--json`` also writes a driver-style artifact: one record per query
with rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err, so a full-surface local run can be committed
alongside the driver's (possibly row-capped) CORRECTNESS_r*.json.
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {ex}"[:300],
            }
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only check) [{t_spark:.1f}s]")
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": None,
            }
            continue
        t0 = time.time()
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(got),
                "oracle_rows": None, "err": f"oracle: {ex}"[:300],
            }
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
        records[name] = {
            "rows_match": len(got) == len(want),
            "schema_match": list(got.columns) == list(want.columns),
            "hash_match": not status,
            "spark_rows": len(got),
            "oracle_rows": len(want),
            "err": "; ".join(status) if status else None,
        }
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
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=2)
        print(f"wrote {json_out} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
