"""As-of join — for each left row, the latest right row with
``right_ts <= left_ts`` per key (market-data / event-attribution
staple that Spark's join operators can't express without a
nested-loop).

Implementation is the UNION + WINDOW technique, which beats any join
at scale: tag both sides, union them, and carry the most recent
right-side payload forward with ``last(..., ignorenulls=True)`` over
a (key, time)-ordered running window.  ONE shuffle on the key —
no join node at all, no range explosion, skew handled by AQE like
any other window partition.

The carried payload is ONE struct of all ``right_cols`` (never one
window function per column): per-column forward-fill would replace a
genuine NULL in the latest matching right row with a stale value from
an older row — mixing fields across right rows instead of the
"latest right row" semantics.  The struct itself is non-null on every
right row (even when every field inside it is NULL), so a single
``last(ignorenulls=True)`` carries whole rows atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + ``right_cols`` from the latest right row at or
    before the left row's time (NULLs when no prior right row).

    ``tiebreak``: optional column name present on both sides making
    the within-timestamp order total (deterministic output).
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    # whole-row payload: one struct column, forward-filled atomically
    payload_type = (
        right.select(
            F.struct(*[F.col(c) for c in right_cols]).alias("_r_payload")
        )
        .schema["_r_payload"]
        .dataType
    )
    tb_cols = [tiebreak] if tiebreak is not None else []
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias("_tb") for c in tb_cols],
        *[F.col(c) for c in left.columns if c != on],
        F.lit(None).cast(payload_type).alias("_r_payload"),
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias("_tb") for c in tb_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on
        ],
        F.struct(*[F.col(c) for c in right_cols]).alias("_r_payload"),
    )
    order = [F.col("_ts"), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col("_tb"))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r).withColumn(
        "_r_payload", F.last("_r_payload", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("_side") == 1).drop("_side", "_ts", "_tb")
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col("_r_payload").getField(c))
    return out.drop("_r_payload")
