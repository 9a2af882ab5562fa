"""Skew-resistant join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; salting is the explicit fallback for pathological keys
(e.g. a gene symbol carrying 10% of all impact rows) or for engines/
versions where the adaptive path doesn't trigger (broadcast-disabled
full-shuffle joins).

Shape: the skewed (large) side gets a deterministic salt in
[0, n_salt) derived by hashing its entire row; the small side is
replicated n_salt times.  Join on (key, salt) spreads each hot key
over n_salt reducers.  Row-hash salting keeps the operator
deterministic (no rand()) — re-executions land rows on the same
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: a scan whose total input is below this many bytes PER CORE would
#: otherwise under-parallelize the row expansion; above it, parquet
#: range-splitting already yields enough scan tasks
_SPREAD_BYTES_PER_SLOT = 8 * 1024 * 1024


def spread_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Give a CPU-heavy per-row expansion (shingle/token/bigram
    explode) at least the session's default parallelism to run on.

    A scan of a small file set yields as few tasks as there are
    row groups — often ONE — so the expansion's whole-stage codegen
    runs on a single core while the rest of the cluster idles (the
    §2.5 input-parallelism problem: the cost is not the bytes scanned
    but the work fanned out PER row; measured at sf0.1 the
    shingle+md5 stage of the LSH pipeline was a single 5-second task
    with 31 cores idle).

    The decision uses only driver-side metadata — ``df.inputFiles()``
    plus file sizes — never the plan's RDD: converting an
    AQE-enabled plan to an RDD materializes its query stages, i.e.
    silently EXECUTES the upstream job (measured 4.6× on a deep
    plan).  The spread fires only when the frame's entire input is
    both few files (< parallelism) and small (< 8 MB/core): exactly
    the regime where the extra round-robin exchange is cheapest and
    the per-row CPU dominates.  At scale either test fails and this
    is a no-op — large inputs range-split into enough scan tasks on
    their own.

    The repartition is keyless round-robin — deterministic under task
    retry because ``spark.sql.execution.sortBeforeRepartition`` stays
    at its default — and sits BELOW every aggregation, so results are
    unchanged by construction.
    """
    spark = df.sparkSession
    if min_parts is not None:
        target = min_parts
    else:
        try:
            target = spark.sparkContext.defaultParallelism
        except Exception:
            # session types without a classic SparkContext (e.g.
            # Spark Connect): degrade to the documented no-op rather
            # than raising out of every caller
            return df
    if target <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:  # un-plannable frame (e.g. streaming source)
        return df
    if not files or len(files) >= target:
        return df
    try:
        jvm = spark._jvm
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            total += fs.getFileStatus(p).getLen()
    except Exception:
        return df
    if total >= target * _SPREAD_BYTES_PER_SLOT:
        return df
    return df.repartition(target)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the large side
    salted ``n_salt`` ways.  Result equals the plain join (tested)
    for ``inner`` and ``left`` only: the small side is replicated
    ``n_salt`` times, so right/full-outer (and right-semi/anti) would
    emit each unmatched small-side row once per salt — those modes
    are rejected rather than silently wrong.  Keep the small side the
    dimension side."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "in right/full/semi/anti modes"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt)
    ).cast("int")
    left = large.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return left.join(right, keys + ["_salt"], how).drop("_salt")
