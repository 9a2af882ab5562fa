"""Tests for token-window chunking (operators/chunking.py) and the
bigram-LM quality score (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vcfdbr_spark.operators.chunking import chunk_documents
from vcfdbr_spark.operators.lm import (
    LM_QUANT,
    doc_bigrams,
    lm_score,
    train_bigram_model,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------------------
# chunking
# ------------------------------------------------------------------


def test_chunk_exact_windows(spark):
    # 6 tokens, window 3, stride 3 -> two full chunks
    docs = _docs(spark, [(1, "a b c d e f")])
    out = chunk_documents(docs, window=3, stride=3).orderBy("chunk_id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, 0, 3, "a b c"), (1, 1, 3, "d e f")]


def test_chunk_overlap_and_tail(spark):
    # 7 tokens, window 4, stride 2 -> starts 1,3,5,7; tail clamps
    docs = _docs(spark, [(1, "t1 t2 t3 t4 t5 t6 t7")])
    out = chunk_documents(docs, window=4, stride=2).orderBy("chunk_id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 3, "t5 t6 t7"),
        (1, 3, 1, "t7"),
    ]


def test_chunk_short_and_empty_docs(spark):
    docs = _docs(spark, [(1, "only two"), (2, "")])
    out = chunk_documents(docs, window=16, stride=8)
    rows = {r["doc_id"]: tuple(r) for r in out.collect()}
    # shorter than window -> exactly one chunk
    assert rows[1] == (1, 0, 2, "only two")
    # empty text: the single empty whitespace token, one chunk
    assert rows[2] == (2, 0, 1, "")


def test_chunk_every_token_covered(spark):
    """Coverage invariant: with stride <= window, reassembling the
    non-overlapping prefix of each chunk reproduces the document."""
    texts = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate([1, 5, 24, 25, 26, 49, 50, 99])
    ]
    docs = _docs(spark, texts)
    window, stride = 16, 12
    out = (
        chunk_documents(docs, window=window, stride=stride)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    rebuilt: dict[int, list[str]] = {}
    for r in out:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["chunk_tokens"] <= window
        # tokens the previous chunk did not already cover
        new = toks if r["chunk_id"] == 0 else toks[-(len(toks) - (window - stride)):] if len(toks) > window - stride else []
        rebuilt.setdefault(r["doc_id"], []).extend(new)
    for i, text in texts:
        assert " ".join(rebuilt[i]) == text


def test_chunk_rejects_bad_stride(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


# ------------------------------------------------------------------
# bigram LM
# ------------------------------------------------------------------


def test_doc_bigrams_drops_short_docs(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "")])
    rows = {
        (r["doc_id"], r["prev"], r["cur"])
        for r in doc_bigrams(docs).collect()
    }
    assert rows == {(1, "a", "b"), (1, "b", "c")}


def test_lm_score_matches_hand_computation(spark):
    # corpus: "a b", "a b", "a c" -> counts: (a,b)=2, (a,c)=1
    # ctx(a)=3, V=2 (distinct cur: b, c)
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}

    def q(c, ctx, v):
        return round(math.log2((2 * c + 1) / (2 * ctx + v)) * LM_QUANT)

    q_ab, q_ac = q(2, 3, 2), q(1, 3, 2)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["bits_per_bigram"] == pytest.approx(
        round(-q_ab / LM_QUANT, 6), abs=1e-9
    )
    assert out[3]["bits_per_bigram"] == pytest.approx(
        round(-q_ac / LM_QUANT, 6), abs=1e-9
    )
    # p(b|a)=5/8 > p(c|a)=3/8: the common bigram scores fewer bits
    assert out[1]["bits_per_bigram"] < out[3]["bits_per_bigram"]


def test_lm_score_case_normalizes(spark):
    docs = _docs(spark, [(1, "The Cat"), (2, "the cat")])
    out = {r["doc_id"]: r["bits_per_bigram"] for r in lm_score(docs).collect()}
    assert out[1] == out[2]


def test_lm_score_pretrained_model_miss_floor(spark):
    """Scoring a NEW batch against a reference model: unseen bigrams
    take the 1/V miss floor via the left join."""
    ref = _docs(spark, [(1, "a b"), (2, "b c")])
    model = train_bigram_model(doc_bigrams(ref))
    new = _docs(spark, [(10, "a b"), (11, "x y")])
    out = {r["doc_id"]: r for r in lm_score(new, model=model).collect()}
    # V = 2 (distinct cur in model: b, c); miss floor = -log2(1/2) = 1 bit
    assert out[11]["bits_per_bigram"] == pytest.approx(1.0, abs=1e-6)
    # seen bigram scores strictly better than the miss floor here:
    # p(b|a) = (2*1+1)/(2*1+2) = 3/4 -> ~0.415 bits
    assert out[10]["bits_per_bigram"] < out[11]["bits_per_bigram"]


def test_lm_model_probabilities_sum_below_one(spark):
    """Smoothed conditional probabilities over OBSERVED followers sum
    to < 1 for every context (mass is reserved for unseen events)."""
    docs = _docs(spark, [(1, "a b a c a b b a"), (2, "c a b c")])
    model = train_bigram_model(doc_bigrams(docs))
    sums = (
        model.withColumn("p", F.pow(F.lit(2.0), F.col("q") / LM_QUANT))
        .groupBy("prev")
        .agg(F.sum("p").alias("s"))
        .collect()
    )
    assert sums, "model is empty"
    for r in sums:
        assert r["s"] < 1.0 + 1e-9


def test_corpus_filter_invariants(spark):
    """Capstone composition: every surviving doc satisfies all three
    gates, and survivors are a subset of the corpus."""
    from vcfdbr_spark.entry_queries import (
        _CF_MAX_BITS,
        _CF_MIN_TOKENS,
        _CF_MIN_TTR,
        q_corpus_filter,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_corpus_filter(spark, sf_dir).collect()
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert out, "filter kept nothing — thresholds degenerate"
    for r in out:
        assert r["doc_id"] in docs
        assert r["n_tokens"] >= _CF_MIN_TOKENS
        assert r["ttr"] >= _CF_MIN_TTR
        assert r["bits_per_bigram"] <= _CF_MAX_BITS
