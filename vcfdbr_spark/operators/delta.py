"""Corpus snapshot delta — the change-data-capture step between two
crawls/ingests of the same corpus.

A production pretraining pipeline re-crawls: most docs are unchanged,
some changed, some new, some gone.  Re-running dedup/quality/mixing
over the full corpus per crawl costs a full-corpus pass; classifying
the delta first lets every downstream incremental operator (the
band-index probe of ``incremental_dedup_pairs``, the streaming
corpus filter, index maintenance) touch only ``added``/``changed``
rows — O(delta), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    hash_cols: tuple[str, ...] = ("text",),
    status_col: str = "status",
) -> DataFrame:
    """(key, status, content_hash) for every key in either snapshot:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    content hash differs), ``unchanged``.  ``content_hash`` is the
    md5 of the ``hash_cols`` concatenated with an ASCII unit
    separator, NULL columns replaced by a NUL-prefixed sentinel so a
    value moving between columns (or NULL vs '') always reads as a
    change (the NEW side's hash when present) — downstream
    incremental consumers key their probes on it.

    Scale shape: each side reduces to (key, hash) AT THE SCAN —
    column pruning drops every other column before the join — then
    one full-outer sort-merge join on the key (both sides shuffle
    once on the same key; with both snapshots stored in the engine's
    id-bucketed layout the Exchange is elided entirely, see
    plans/bucketing.py).  No skew risk: keys are unique per side, so
    every join group is ≤ 2 rows.  Output is O(keys); downstream
    filters on ``status`` prune to O(delta).
    """
    def side(df: DataFrame, alias: str):
        # NULL-safe: concat_ws SKIPS null columns, which would hash
        # (title='a', text=NULL) and (title=NULL, text='a') — or NULL
        # vs '' — identically; a \x00-prefixed sentinel (no real cast
        # string starts with NUL) keeps every column position distinct
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00N"))
                    for c in hash_cols
                ],
            )
        )
        return df.select(
            F.col(key_col).alias("_k"), h.alias(alias)
        )

    o = side(old, "_ho")
    n = side(new, "_hn")
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.col("_k").alias(key_col),
        status.alias(status_col),
        F.coalesce("_hn", "_ho").alias("content_hash"),
    )
