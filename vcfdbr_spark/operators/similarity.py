"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — query set × corpus.
  Scale path: the query side is broadcast (small), the corpus scan
  stays partitioned; per-partition top-k happens inside the window's
  partial sort.  Cost is O(|Q|·|C|·d) — the baseline.
- ``lsh_topk``: random-hyperplane-free LSH variant using quantized
  component signs as the bucket key (engine-portable, no RNG):
  candidates share a bucket, then exact re-rank.  The scale path for
  |C| ≫ 10⁶ per query.

Scores are computed in QUANTIZED INTEGER space (component ×1000 →
BIGINT): dot/norms are exact integer sums (order-independent —
deterministic on any engine / any partitioning), converted to a
double cosine once at the end.  Rounded to 6 dp + id tiebreak →
stable ranking everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantize(col, scale: int = 1000):
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    q = _quantize(F.col(vec_col))
    return df.withColumn("_qv", q).withColumn("_norm", _dot(F.col("_qv"), F.col("_qv")))


def cosine_score(qv, cv, qn, cn):
    return F.round(
        _dot(qv, cv).cast("double")
        / (F.sqrt(qn.cast("double")) * F.sqrt(cn.cast("double"))),
        6,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus
    (excluding self-matches by id)."""
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("_qv").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    q = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_qv").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_score(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
        .select("query_id", "cand_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def sign_lsh_bucket(vec_col, n_components: int = 8):
    """Bucket key from the signs of the first n components — a
    deterministic, RNG-free hyperplane LSH (axis-aligned planes)."""
    signs = F.transform(
        F.slice(vec_col, 1, n_components),
        lambda x: F.when(x.cast("double") >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.concat_ws("", signs)


def ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist_mod: int = 25,
) -> DataFrame:
    """IVF inverted-list assignment: every vector → its nearest
    centroid.  Centroids are the corpus vectors with
    ``id % nlist_mod == 0`` — a deterministic, training-free index
    (no RNG, no k-means iterations) so the whole structure is
    oracle-checkable; swap in trained centroids for production recall.

    Scale shape: |C| × |centroids| scored with the centroid side
    broadcast; the output is the inverted index, built once and
    reused across queries.
    """
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("_vid"),
        F.col("_qv").alias("vv"),
        F.col("_norm").alias("vn"),
    )
    cents = with_quantized(
        corpus.filter(F.col(id_col) % nlist_mod == 0), vec_col
    ).select(
        F.col(id_col).alias("cent_id"),
        F.col("_qv").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    scored = c.join(F.broadcast(cents)).withColumn(
        "score",
        cosine_score(F.col("vv"), F.col("cv"), F.col("vn"), F.col("cn")),
    )
    w = Window.partitionBy("_vid").orderBy(F.col("score").desc(), F.col("cent_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(F.col("_vid").alias(id_col), "cent_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist_mod: int = 25,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: score only the vectors whose inverted
    list is among the query's ``nprobe`` nearest centroids — the
    |C| ≫ 10⁶ scale path where brute force is off the table."""
    assign = ivf_assign(corpus, id_col, vec_col, nlist_mod)
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("_qv").alias("cv"),
        F.col("_norm").alias("cn"),
    ).join(assign.select(F.col(id_col).alias("cand_id"), "cent_id"), "cand_id")
    cents = with_quantized(
        corpus.filter(F.col(id_col) % nlist_mod == 0), vec_col
    ).select(
        F.col(id_col).alias("cent_id"),
        F.col("_qv").alias("ccv"),
        F.col("_norm").alias("ccn"),
    )
    q = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_qv").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    qc = q.join(F.broadcast(cents)).withColumn(
        "cscore",
        cosine_score(F.col("qv"), F.col("ccv"), F.col("qn"), F.col("ccn")),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cent_id")
    )
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "cent_id", "qv", "qn")
    )
    scored = (
        c.join(probes, "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_score(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
        .select("query_id", "cand_id", "score")
        .distinct()  # a candidate may appear via multiple probed lists
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "cand_id", "score", F.col("rank").cast("long").alias("rank")
        )
    )


def embedding_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a sign
    bucket (LSH), exact rounded-cosine filter at ``threshold``."""
    v = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("_vid"),
        sign_lsh_bucket(F.col(vec_col), n_components).alias("bucket"),
        F.col("_qv").alias("v"),
        F.col("_norm").alias("n"),
    )
    a = v.select(
        F.col("_vid").alias("a"), "bucket", F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = v.select(
        F.col("_vid").alias("b"), "bucket", F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "score",
            cosine_score(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket, exact re-rank inside.  Recall < 1 by design; at 100 TB the
    bucket join replaces the full cross product."""
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"),
        sign_lsh_bucket(F.col(vec_col), n_components).alias("bucket"),
        F.col("_qv").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    q = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        sign_lsh_bucket(F.col(vec_col), n_components).alias("bucket"),
        F.col("_qv").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_score(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
        .select("query_id", "cand_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", F.col("rank").cast("long").alias("rank"))
    )
