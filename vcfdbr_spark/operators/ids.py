"""Dense sequential id assignment — the reference's ``variant_id``.

Reference semantics (pipeline/02-build-db.R:258-259, :522): ids are a
dense 1..N sequence assigned in chunk order, i.e. in (chr, pos) order
of the tabix scan; density is load-bearing — the random-pull benchmark
samples uniformly from 1:max_id (benchmarks/00-benchmark-functions.R:58-59)
and file-mode uses the id as a filename.

Scale design: a naive ``row_number() OVER (ORDER BY ...)`` collapses to
a single partition — unusable at 100 TB.  Instead:

1. range-repartition + sort within partitions on the order columns
   (one shuffle, fully parallel);
2. count rows per partition (cheap agg over partition ids);
3. prefix-sum the per-partition counts with a window over the tiny
   aggregated frame (one row per partition) and broadcast-join the
   offsets back;
4. id = offset + intra-partition row_number (window partitioned by the
   physical partition id, so every window is independent and parallel).

This is the DataFrame rendering of ``rdd.zipWithIndex`` but keeps the
plan in Catalyst/Tungsten (no Python serialization, no RDD hop).

Everything stays in ONE logical plan: both the counts branch and the
row branch read the same range-shuffle output, so Spark's
ReuseExchange guarantees they see identical partition assignments.
(Two separate jobs — e.g. collecting counts to the driver first —
can recompute the shuffle with different partition boundaries and
silently corrupt the ids.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "variant_id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a dense sequential ``id_col`` (start..start+N-1) ordered by
    ``order_cols``, without a single-partition global sort.

    Invariant (tested): max(id) - start + 1 == count(*) and ids are the
    exact rank order of ``order_cols``.
    """
    parts = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *parts)
    else:
        ranged = df.repartitionByRange(*parts)
    ranged = ranged.sortWithinPartitions(*parts).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Per-partition counts: one row per partition.  The cumulative-sum
    # window below runs over that tiny frame (O(partitions) rows in a
    # single task) — NOT over the data — so there is no global-sort
    # bottleneck.
    w_cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            (F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)) + F.lit(start)).cast(
                "long"
            ),
        )
        .drop("_cnt")
    )
    w = Window.partitionBy("_pid").orderBy(*parts)
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )
    return out.select(id_col, *df.columns)
