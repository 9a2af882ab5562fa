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
    carried = [f"_r_{c}" for c in right_cols]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).alias(rc) for rc in carried],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    order = [F.col("_ts"), F.col("_side")]
    if tiebreak is not None:
        # a right row's left-side tiebreak slot is NULL (and vice
        # versa) — coalesce the two slots so the order is total on
        # both sides of the union
        tb = (
            F.coalesce(F.col(tiebreak), F.col(f"_r_{tiebreak}"))
            if tiebreak in right_cols
            else F.col(tiebreak)
        )
        order.append(tb)
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r)
    for c, rc in zip(right_cols, carried):
        u = u.withColumn(rc, F.last(rc, ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop("_side", "_ts")
    for c, rc in zip(right_cols, carried):
        out = out.withColumnRenamed(rc, f"asof_{c}")
    return out
