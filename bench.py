"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full column
materialization — count() would let Catalyst prune the work away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference-parity workloads (BASELINE.md shapes)
    "vcfsim_filter_test",
    "vcfsim_geno_pull",
    "vcfsim_impact_flags",
    "vcfsim_info_rare",
    # relational core
    "tpch_q1",
    "filter_distinct_join_count",
    "per_key_count_binned",
    # events
    "events_hourly",
    # training-data ops
    "dedup_exact",
    "text_stats",
    "minhash_pairs",
    "simhash",
    "embedding_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vcfdbr_spark import get_spark
    from vcfdbr_spark.entry_queries import QUERIES

    spark = get_spark(app_name="vcfdbr-bench", extra_conf={"spark.ui.enabled": "false"})
    spark.range(1).count()  # JVM warmup outside timed region

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
