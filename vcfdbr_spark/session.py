"""SparkSession factory with scale-aware defaults.

The engine targets a multi-executor cluster reading ~100 TB; tests run
on local[N].  All tuning lives here so both paths share one config
surface:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- shuffle partitions sized for the local test harness; on a real
  cluster AQE coalesces the 2000-partition default down, so we set a
  modest local value and let ``spark.sql.adaptive.coalescePartitions``
  handle the rest.
- Arrow enabled for any pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vcfdbr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` when no
    cluster master is configured — on a real deployment spark-submit
    supplies the master and this falls through.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet writes: dictionary + stats give the min/max pruning
        # that stands in for the reference's SQLite B-tree indexes
        # (pipeline/03-index-db.R:37-65).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # zstd over the default snappy for every Parquet the engine
        # writes: measured on the sf1 geno store (BENCH_NOTES r13),
        # 24% smaller files at equal-or-faster write AND equal scan
        # time.  At the 100 TB target that is 24% less store
        # footprint, and the write path degrades 24% less on
        # disk-throughput-bound windows.  (Shuffle/spill compression
        # is governed by spark.io.compression.codec below, not by
        # this writer codec.)  Readers are codec-agnostic (footer
        # metadata), so existing snappy stores stay readable.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Same trade for shuffle/broadcast blocks (default lz4):
        # interleaved 2x2-session A/B at sf1 on the four most
        # shuffle-heavy keys (BENCH_NOTES r13) measured -51% shuffle
        # bytes (122.0 -> 59.9 MB, deterministic) at wall-times
        # inside window noise.  local[32] shuffles through the page
        # cache, so equal local time means the compression CPU is
        # absorbed; on a real cluster those bytes cross the network
        # and the win is proportional to the byte cut.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # PySpark 4 walks the Python stack on EVERY DataFrame API call
        # to enrich error messages with the user call site.  The VCF
        # parse builds thousands of Column expressions, where that walk
        # is a measured ~0.6 s of pure driver time per plan build
        # (profiled via errors.utils._capture_call_site).  An engine
        # library doesn't need per-call user-frame attribution; pass
        # extra_conf={"spark.python.sql.dataFrameDebugging.enabled":
        # "true"} to re-enable while debugging.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
