"""As-of join — for each left row, the latest right row with
``right_ts <= left_ts`` per key (market-data / event-attribution
staple that Spark's join operators can't express without a
nested-loop).  Full pandas ``merge_asof`` surface: ``direction``
backward / forward / nearest and ``allow_exact_matches``.

Implementation is the UNION + WINDOW technique, which beats any join
at scale: tag both sides, union them, and carry the most recent
right-side payload forward with ``last(..., ignorenulls=True)`` over
a (key, time)-ordered running window.  ONE shuffle on the key —
no join node at all, no range explosion, skew handled by AQE like
any other window partition.  ``forward`` is the same carry over the
REVERSED time order; ``nearest`` evaluates both carries over the one
shuffled partition (two in-partition sorts, still one Exchange) and
picks the closer match per row (ties → backward, pandas semantics).

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
from pyspark.sql.types import TimestampNTZType, TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: float | None = None,
) -> DataFrame:
    """Left rows + ``right_cols`` from the matching right row (NULLs
    when no match exists).

    ``direction`` (pandas ``merge_asof`` parity):

    - ``'backward'`` (default): latest right row with
      ``right_ts <= left_ts`` (``<`` when ``allow_exact_matches``
      is False);
    - ``'forward'``: earliest right row with ``right_ts >= left_ts``
      (``>`` without exact matches);
    - ``'nearest'``: whichever of the two is closer in absolute time;
      ties prefer backward.

    ``tiebreak``: optional column name present on both sides making
    the within-timestamp order total (deterministic output).  Among
    right rows sharing the boundary timestamp, backward selects the
    LARGEST tiebreak (the last in time order) and forward the
    SMALLEST (the first) — the row "closest" to the left row from
    each direction.

    ``tolerance``: maximum allowed |left_ts − match_ts|; farther
    matches become NULL (pandas parity).  Units: SECONDS when the
    time column is a timestamp, the column's own units for numerics.
    Applied as a post-filter on the carried match — plan shape is
    unchanged (no extra shuffle).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    # whole-row payload: one struct column, forward-filled atomically.
    # _rts rides inside so 'nearest' can compare match distances.
    payload_type = (
        right.select(
            F.struct(
                *[F.col(c) for c in right_cols],
                F.col(right_ts).alias("_rts"),
            ).alias("_r_payload")
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
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("_rts"),
        ).alias("_r_payload"),
    )
    u = l.unionByName(r)

    # At equal timestamps the side order decides exact-match
    # visibility: with exact matches the right row must precede the
    # left row in scan order (so the carry sees it); without, the
    # left row precedes (so it can't).  _side is 0=right / 1=left,
    # hence ASC for exact, DESC for strict.
    side_order = (
        F.col("_side") if allow_exact_matches else F.col("_side").desc()
    )

    def _carry(u, order):
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_r_payload", ignorenulls=True).over(w)

    back_order = [F.col("_ts").asc(), side_order] + (
        [F.col("_tb").asc()] if tiebreak is not None else []
    )
    fwd_order = [F.col("_ts").desc(), side_order] + (
        [F.col("_tb").desc()] if tiebreak is not None else []
    )

    is_ts = isinstance(
        u.schema["_ts"].dataType, (TimestampType, TimestampNTZType)
    )
    if is_ts:
        # unix_micros only accepts TIMESTAMP; NTZ casts losslessly
        def ts_num(c):
            return F.unix_micros(c.cast("timestamp"))
    else:
        def ts_num(c):
            return c.cast("double")

    if direction == "backward":
        u = u.withColumn("_match", _carry(u, back_order))
    elif direction == "forward":
        u = u.withColumn("_match", _carry(u, fwd_order))
    else:  # nearest: both carries over the SAME shuffled partition
        b, f = _carry(u, back_order), _carry(u, fwd_order)
        u = (
            u.withColumn("_b", b)
            .withColumn("_f", f)
            .withColumn(
                "_match",
                F.when(F.col("_b").isNull(), F.col("_f"))
                .when(F.col("_f").isNull(), F.col("_b"))
                .when(
                    # tie → backward (pandas semantics)
                    (ts_num(F.col("_ts")) - ts_num(F.col("_b._rts")))
                    <= (ts_num(F.col("_f._rts")) - ts_num(F.col("_ts"))),
                    F.col("_b"),
                )
                .otherwise(F.col("_f")),
            )
            .drop("_b", "_f")
        )
    if tolerance is not None:
        tol = float(tolerance) * (1_000_000 if is_ts else 1)
        dist = F.abs(
            ts_num(F.col("_ts")) - ts_num(F.col("_match._rts"))
        )
        u = u.withColumn(
            "_match", F.when(dist <= F.lit(tol), F.col("_match"))
        )
    out = u.filter(F.col("_side") == 1).drop(
        "_side", "_ts", "_tb", "_r_payload"
    )
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col("_match").getField(c))
    return out.drop("_match")
