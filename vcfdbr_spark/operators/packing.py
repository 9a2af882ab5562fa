"""Sequence packing: assign documents to fixed-token-budget packs —
the batch-construction step of an LLM training pipeline (each pack
becomes one context window; short docs are concatenated to avoid
padding waste).

Spark shape: a running token total within each shard (window
function) converts to a pack index by integer division.  Packing is
SHARDED on a hash of the id — each shard packs independently, so the
cumulative-sum window partitions by shard and parallelizes instead of
collapsing onto one task (the unsharded global cumsum is the classic
100-TB window-function trap).  Shards map 1:1 to downstream data
files, which is exactly how training shards are consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vcfdbr_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    window_tokens: int = 2048,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, offset, pack_id, straddles) — contiguous
    greedy packing in id order within each shard.

    ``offset`` is the token position where the doc starts inside its
    shard's stream; ``pack_id`` the window it starts in;
    ``straddles`` whether it crosses a window boundary (a real
    pipeline would split it across packs there).
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    toks = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = toks.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / window_tokens).cast("long").alias("pack_id"),
        (
            F.floor(F.col("offset") / window_tokens)
            != F.floor(
                (F.col("offset") + F.col("n_tokens") - 1) / window_tokens
            )
        ).alias("straddles"),
    )


def pack_shuffled(
    docs: DataFrame,
    window_tokens: int = 512,
    n_buckets: int = 8,
    epoch: int = 0,
    seed: str = "shuf",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing in SHUFFLED order — :func:`pack_sequences` composed
    with the deterministic epoch shuffle
    (:func:`~vcfdbr_spark.operators.sampling.epoch_shuffle`): the
    shard is the shuffle BUCKET and the cumulative sum runs in
    ``order_key`` order, so each pack concatenates a pseudo-random
    doc mix (decorrelated batches) instead of id-adjacent docs, and
    the whole training order is reproducible from (seed, epoch).

    Same scale shape as :func:`pack_sequences`: the window partitions
    by bucket (uniform md5 top bits — balanced by construction), so
    the cumsum parallelizes across buckets; no global sort, one
    shuffle on the bucket key.  Returns (id, bucket, order_key,
    n_tokens, offset, pack_id, straddles).
    """
    from vcfdbr_spark.operators.sampling import (
        shuffle_bucket,
        shuffle_order_key,
    )

    # the SAME order-key/bucket definitions as epoch_shuffle — shared
    # helpers, so the '(seed, epoch)-reproducible' claim cannot drift
    u = shuffle_order_key(F.col(id_col), F.lit(epoch), seed)
    toks = docs.select(
        F.col(id_col),
        shuffle_bucket(u, n_buckets).alias("bucket"),
        u.alias("order_key"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("order_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = toks.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return out.select(
        id_col,
        "bucket",
        "order_key",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / window_tokens).cast("long").alias("pack_id"),
        (
            F.floor(F.col("offset") / window_tokens)
            != F.floor(
                (F.col("offset") + F.col("n_tokens") - 1) / window_tokens
            )
        ).alias("straddles"),
    )
