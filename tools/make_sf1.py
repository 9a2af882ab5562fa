"""Derive a deterministic sf1-scale dataset (10x sf0.1) for scale-shape
benchmarking, WITHOUT touching the read-only /root/testdata.

    python tools/make_sf1.py [--out /tmp/sf1] [--copies 10]

The driver ships sf{0.001,0.01,0.1} only; demonstrating that per-query
time scales ~linearly needs one decade more.  Each table is replicated
``copies`` times with key shifts that preserve referential integrity
(orders.o_custkey moves with customer.c_custkey, etc.), so every join
fans out 10x on both sides exactly like a genuinely larger TPC-H
generation would:

- region/nation: fixed dimensions (TPC-H does not scale them).
- customer/supplier/part/orders/lineitem/events: all keys shifted by
  ``copy * (max_key + 1)`` per table; payload columns untouched, so
  group cardinalities (genes, dates, event types) stay constant and
  per-group density grows 10x — the classic fact-table scaling shape.
- documents: doc_id shifted; for copies > 0 the words of each text
  are deterministically re-ordered (sort by xxhash64(word, pos,
  copy)), which destroys cross-copy near-duplicate structure while
  preserving intra-copy duplicates — the dedup workload therefore
  scales ~linearly (10x docs, ~10x pairs) instead of quadratically
  (10 identical copies of every doc would make EVERY doc a 10-member
  dup cluster: C(10,2) pair blowup, a replication artifact rather
  than a corpus property).
- embeddings: vec_id shifted; components jittered +-0.1 by
  xxhash64(vec_id, i, copy) so the copies are distinct isotropic
  vectors, not exact duplicates of the originals.

Determinism: every derived value is a pure function of (source row,
copy index) — re-running reproduces the dataset bit-for-bit, so the
committed BENCH_sf1.json is reproducible from sf0.1 alone.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vcfdbr_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _copies_col(n: int):
    return F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("_k")


def _shift(col: str, step: int):
    return (F.col(col) + F.col("_k") * F.lit(step)).alias(col)


def _max_plus_one(spark, table: str, key: str) -> int:
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    return int(df.agg(F.max(key)).first()[0]) + 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="make-sf1")
    n = args.copies

    steps = {
        "customer": _max_plus_one(spark, "customer", "c_custkey"),
        "supplier": _max_plus_one(spark, "supplier", "s_suppkey"),
        "part": _max_plus_one(spark, "part", "p_partkey"),
        "orders": _max_plus_one(spark, "orders", "o_orderkey"),
        "events": _max_plus_one(spark, "events", "event_id"),
        "users": _max_plus_one(spark, "events", "user_id"),
        "documents": _max_plus_one(spark, "documents", "doc_id"),
        "embeddings": _max_plus_one(spark, "embeddings", "vec_id"),
    }

    def t(name: str):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def w(df, name: str) -> None:
        df.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{args.out}/{name}.parquet').count()} rows")

    # fixed dims
    w(t("region"), "region")
    w(t("nation"), "nation")

    cust = t("customer").select("*", _copies_col(n))
    w(cust.select(_shift("c_custkey", steps["customer"]),
                  "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer")

    supp = t("supplier").select("*", _copies_col(n))
    w(supp.select(_shift("s_suppkey", steps["supplier"]),
                  "s_name", "s_nationkey", "s_acctbal"),
      "supplier")

    part = t("part").select("*", _copies_col(n))
    w(part.select(_shift("p_partkey", steps["part"]),
                  "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "part")

    orders = t("orders").select("*", _copies_col(n))
    w(orders.select(_shift("o_orderkey", steps["orders"]),
                    _shift("o_custkey", steps["customer"]),
                    "o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority"),
      "orders")

    li = t("lineitem").select("*", _copies_col(n))
    w(li.select(_shift("l_orderkey", steps["orders"]),
                _shift("l_partkey", steps["part"]),
                _shift("l_suppkey", steps["supplier"]),
                "l_linenumber", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                "l_shipdate"),
      "lineitem")

    ev = t("events").select("*", _copies_col(n))
    w(ev.select(_shift("event_id", steps["events"]),
                "ts",
                _shift("user_id", steps["users"]),
                "event_type", "value", "props"),
      "events")

    docs = t("documents").select("*", _copies_col(n))
    shuffled = F.when(F.col("_k") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda wd, i: F.struct(
                            F.xxhash64(wd, i, F.col("_k")).alias("h"),
                            wd.alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        )
    )
    w(docs.select(_shift("doc_id", steps["documents"]),
                  shuffled.alias("text"), "lang", "source")
          .withColumn("n_chars", F.length("text")),
      "documents")

    emb = t("embeddings").select("*", _copies_col(n))
    jittered = F.when(F.col("_k") == 0, F.col("embedding")).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id"), i, F.col("_k")), F.lit(2001))
                    - F.lit(1000)
                ).cast("double")
                / F.lit(10000.0)
            ).cast("float"),
        )
    )
    w(emb.select(_shift("vec_id", steps["embeddings"]),
                 jittered.alias("embedding"), "label"),
      "embeddings")

    print(f"wrote {args.out} ({n}x sf0.1)")


if __name__ == "__main__":
    main()
