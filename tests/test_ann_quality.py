"""ANN quality gates (VERDICT r6 #4): the `lsh_recall` query MEASURES
recall but nothing asserted it — determinism was pinned by the oracle,
quality wasn't.  These floors make a silent recall regression (a
banding change, a centroid-training change) a CI failure.

The floors run on a PLANTED-neighbor fixture, not the synthetic
testdata: the testdata embeddings are isotropic random vectors, whose
"top-5 neighbors" are barely-correlated random points — sign-LSH
recall on those is ~0.08 BY CONSTRUCTION (there is nothing near to
find), which gates nothing.  Planted clusters (members within ~0.99
cosine) are the shape ANN indexes exist for and where recall floors
are meaningful.  Thresholds are documented in SCALE.md.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from vcfdbr_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

DIM = 64
N_CLUSTERS = 30
CLUSTER_SIZE = 4
N_DISTRACTORS = 100


def _planted(spark):
    """30 clusters x 4 near-identical members (components of stable
    sign: magnitude >= 0.3, noise <= 0.05 — cosine between siblings
    ~0.99) plus 100 isotropic distractors.  Queries = one member per
    cluster; ground-truth neighbors = its 3 siblings."""
    rng = random.Random(7)
    rows, query_ids = [], []
    vid = 0
    for _ in range(N_CLUSTERS):
        base = [
            rng.choice([-1.0, 1.0]) * rng.uniform(0.3, 1.0) for _ in range(DIM)
        ]
        for m in range(CLUSTER_SIZE):
            rows.append(
                (vid, [x + rng.uniform(-0.05, 0.05) for x in base])
            )
            if m == 0:
                query_ids.append(vid)
            vid += 1
    for _ in range(N_DISTRACTORS):
        rows.append((vid, [rng.uniform(-1.0, 1.0) for _ in range(DIM)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return emb, emb.filter(F.col("vec_id").isin(query_ids))


def _recall(bf, approx) -> float:
    """Fraction of brute-force ground-truth (query, cand) rows the
    approximate search retrieved."""
    n_truth = bf.count()
    n_hit = bf.join(
        approx.select("query_id", "cand_id"),
        ["query_id", "cand_id"],
        "left_semi",
    ).count()
    return n_hit / n_truth


def test_ann_recall_floors_on_planted_clusters(spark):
    """Floors: sign-LSH recall@3 >= 0.6, IVF(nprobe=3) recall@3 >=
    0.8 against exact brute force.  On this fixture both should be
    near-perfect (siblings share sign bands / centroid lists); the
    floors leave headroom for banding-parameter changes, not for
    recall collapses."""
    emb, queries = _planted(spark)
    k = CLUSTER_SIZE - 1
    bf = brute_force_topk(emb, queries, k=k).select(
        "query_id", "cand_id"
    ).persist()
    # ground-truth sanity: brute force must rank the planted siblings
    # on top — if this fails the FIXTURE is broken, not the index
    sib = bf.filter(
        (F.col("cand_id") >= F.col("query_id"))
        & (F.col("cand_id") < F.col("query_id") + CLUSTER_SIZE)
    ).count()
    assert sib / bf.count() > 0.95

    lsh_recall = _recall(bf, lsh_topk(emb, queries, k=k, n_bands=8, bits_per_band=8))
    ivf_recall = _recall(bf, ivf_topk(emb, queries, k=k, nprobe=3))
    bf.unpersist()
    assert lsh_recall >= 0.6, f"sign-LSH recall collapsed: {lsh_recall:.3f}"
    assert ivf_recall >= 0.8, f"IVF recall collapsed: {ivf_recall:.3f}"


def test_ivf_recall_floor_on_testdata(spark):
    """IVF must also hold its floor on the real testdata embeddings
    (isotropic vectors — the HARD case for a clustered index, since
    inverted lists carve a space with no cluster structure): nprobe=3
    recall@5 >= 0.8 at sf0.01 (measured 1.0)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    bf = brute_force_topk(emb, queries, k=5).select(
        "query_id", "cand_id"
    ).persist()
    got = _recall(bf, ivf_topk(emb, queries, k=5, nprobe=3))
    bf.unpersist()
    assert got >= 0.8, f"IVF recall on testdata collapsed: {got:.3f}"
