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
    assert rows == [(1, 0, 1, 3, "a b c"), (1, 1, 4, 3, "d e f")]


def test_chunk_overlap_and_clamped_tail(spark):
    # 7 tokens, window 4, stride 2 -> stride starts clamp at the last
    # full-window position (4): starts 1, 3, 4 — NO duplicate-suffix
    # trailing chunks, and every chunk of a >=window doc is full width
    docs = _docs(spark, [(1, "t1 t2 t3 t4 t5 t6 t7")])
    out = chunk_documents(docs, window=4, stride=2).orderBy("chunk_id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, 0, 1, 4, "t1 t2 t3 t4"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 4, 4, "t4 t5 t6 t7"),
    ]


def test_chunk_stride_lands_on_tail_exactly(spark):
    # 9 tokens, window 3, stride 3: stride starts 1,4,7 already end at
    # the last-window position 7 — the tail union must NOT duplicate it
    docs = _docs(spark, [(1, " ".join(f"x{i}" for i in range(1, 10)))])
    out = chunk_documents(docs, window=3, stride=3).orderBy("chunk_id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, 0, 1, 3, "x1 x2 x3"),
        (1, 1, 4, 3, "x4 x5 x6"),
        (1, 2, 7, 3, "x7 x8 x9"),
    ]


def test_chunk_short_and_empty_docs(spark):
    docs = _docs(spark, [(1, "only two"), (2, "")])
    out = chunk_documents(docs, window=16, stride=8)
    rows = {r["doc_id"]: tuple(r) for r in out.collect()}
    # shorter than window -> exactly one chunk
    assert rows[1] == (1, 0, 1, 2, "only two")
    # empty text: the single empty whitespace token, one chunk
    assert rows[2] == (2, 0, 1, 1, "")


def test_chunk_every_token_covered_no_redundant_chunks(spark):
    """Coverage invariant: with stride <= window every token appears
    in at least one chunk; and no chunk's token range is contained in
    another chunk's (no duplicate-suffix tails)."""
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
    ranges: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        assert len(r["chunk_text"].split(" ")) == r["chunk_tokens"] <= window
        ranges.setdefault(r["doc_id"], []).append(
            (r["w_start"], r["w_start"] + r["chunk_tokens"] - 1)
        )
    for i, text in texts:
        n = len(text.split(" "))
        covered = set()
        for s, e in ranges[i]:
            covered.update(range(s, e + 1))
        assert covered == set(range(1, n + 1)), f"doc {i} coverage gap"
        rs = ranges[i]
        for a in rs:
            for b in rs:
                assert a == b or not (
                    a[0] >= b[0] and a[1] <= b[1]
                ), f"doc {i}: chunk {a} contained in {b}"


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


def test_lm_score_pretrained_model_context_aware_miss(spark):
    """Scoring a NEW batch against a reference model: an unseen
    bigram takes the add-1/2 smoothed miss p = 1/(2*ctx + V) of ITS
    context (1/V when the context is unseen) — monotone below every
    seen bigram of the same context, so gibberish can't out-score
    rare-but-valid text."""
    ref = _docs(spark, [(1, "a b"), (2, "b c")])
    model = train_bigram_model(doc_bigrams(ref), materialize=False)
    new = _docs(spark, [(10, "a b"), (11, "x y"), (12, "a c")])
    out = {r["doc_id"]: r for r in lm_score(new, model=model).collect()}
    # V = 2 (distinct cur: b, c); unseen context x: p = 1/V -> 1 bit
    assert out[11]["bits_per_bigram"] == pytest.approx(1.0, abs=1e-6)
    # unseen bigram in SEEN context a (ctx=1): p = 1/(2*1+2) = 1/4
    # -> 2 bits, strictly worse than the seen (a,b) at 3/4 -> 0.415
    assert out[12]["bits_per_bigram"] == pytest.approx(2.0, abs=1e-6)
    assert out[10]["bits_per_bigram"] < out[12]["bits_per_bigram"]


def test_lm_score_min_count_floor_semantics(spark):
    """The vocabulary floor (min_count): (1) the smoothing
    denominators keep the FULL mass — a kept bigram's score is
    IDENTICAL with and without the floor; (2) a pruned (singleton)
    bigram scores through the add-1/2 miss formula 1/(2·ctx + V) of
    its FULL context, strictly below every kept bigram of that
    context; (3) min_count=1/None are exact no-ops."""
    # counts: (a,b)=3, (a,c)=1 → ctx(a)=4, V=2
    docs = _docs(
        spark, [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")]
    )
    plain = {r["doc_id"]: r for r in lm_score(docs).collect()}
    floored = {
        r["doc_id"]: r for r in lm_score(docs, min_count=2).collect()
    }

    def bits(p):
        return round(round(-math.log2(p) * LM_QUANT) / LM_QUANT, 6)

    # kept bigram (a,b): same smoothed p = (2*3+1)/(2*4+2) both ways
    assert floored[1]["bits_per_bigram"] == plain[1]["bits_per_bigram"]
    assert floored[1]["bits_per_bigram"] == pytest.approx(
        bits(7 / 10), abs=1e-9
    )
    # pruned singleton (a,c): plain scores (2*1+1)/10, floored takes
    # the miss 1/(2*ctx + V) = 1/10 — strictly more bits
    assert plain[4]["bits_per_bigram"] == pytest.approx(
        bits(3 / 10), abs=1e-9
    )
    assert floored[4]["bits_per_bigram"] == pytest.approx(
        bits(1 / 10), abs=1e-9
    )
    assert floored[4]["bits_per_bigram"] > floored[1]["bits_per_bigram"]
    # no-op floors
    for mc in (None, 1):
        same = {
            r["doc_id"]: r["bits_per_bigram"]
            for r in lm_score(docs, min_count=mc).collect()
        }
        assert same == {
            k: v["bits_per_bigram"] for k, v in plain.items()
        }


def test_lm_train_materialize_releases_intermediates(spark):
    """materialize=True leaves exactly ONE net cache — the returned
    model (the reusable index; caller releases) — not the counts
    intermediate.  Compared as ID SETS, not counts: earlier tests in
    the session leave ContextCleaner-managed localCheckpoint RDDs
    that are released asynchronously on GC, so old ids may VANISH
    mid-test (a count delta once read −2 from exactly that race);
    only the NEW ids are ours to assert."""

    def rdd_ids() -> set[int]:
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    spark.catalog.clearCache()
    before = rdd_ids()
    docs = _docs(spark, [(1, "a b a c"), (2, "b a b c")])
    model = train_bigram_model(doc_bigrams(docs), materialize=True)
    new = rdd_ids() - before
    assert len(new) == 1, f"expected only the model net-cached, got {new}"
    model.unpersist(True)
    assert not (rdd_ids() - before)


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


def test_corpus_filter_dedups_among_survivors_only(spark):
    """Ordering pin: a near-dup cluster whose MIN-ID member fails a
    quality gate must still keep its passing member — dedup runs
    among survivors, not on the raw corpus (where min-id keep would
    drop the passing doc and the gate would drop the kept one)."""
    from vcfdbr_spark.operators.pipeline import corpus_filter

    junk = " ".join(["junk"] * 50)  # ttr = 1/50 -> fails min_ttr
    tail = " ".join(f"t{i}" for i in range(60))
    rows = [
        (1, junk, "en", "s"),  # min id, fails ttr, shares sig prefix
        (2, junk + " " + tail, "en", "s"),  # passes, near-dup of 1
        (3, " ".join(f"u{i}" for i in range(40)), "en", "s"),  # unique
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {
        r["doc_id"]
        for r in corpus_filter(
            docs, min_tokens=20, min_ttr=0.3, max_bits=None
        ).collect()
    }
    # doc 1 fails ttr; doc 2 must SURVIVE despite pairing with the
    # failing min-id doc; doc 3 untouched
    assert out == {2, 3}


def test_corpus_filter_still_dedups_passing_pairs(spark):
    """Counterpart: two PASSING near-dups still collapse to min id."""
    from vcfdbr_spark.operators.pipeline import corpus_filter

    base = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base, "en", "s"), (2, base + " extra", "en", "s")],
        ["doc_id", "text", "lang", "source"],
    )
    out = {
        r["doc_id"]
        for r in corpus_filter(
            docs, min_tokens=20, min_ttr=0.3, max_bits=None
        ).collect()
    }
    assert out == {1}


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
