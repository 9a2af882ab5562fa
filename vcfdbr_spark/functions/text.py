"""Text-analysis column functions for training-data pipelines.

All pure built-in column algebra (JVM-side, codegen-friendly): token
counting, quality stats, stopword-based language scoring, and a
rolling document fingerprint.  Designed to run over a ``documents``
table with a ``text`` column at 100 TB — per-row expressions only, no
shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny public stopword lists (enough for a deterministic heuristic).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "pour", "dans", "sur"],
}

# BPE-ish pre-tokenization: words | numbers | single non-space symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split, matching the simple
    oracle-SQL string_split semantics)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Regex token count (BPE-ish pre-tokenizer)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def stopword_count(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(
        F.filter(ws_tokens(F.lower(text)), lambda t: t.isin(*words))
    )


def lang_guess(text: Column) -> Column:
    """Deterministic stopword-vote language id: highest hit count wins,
    ties broken en > de > fr (fixed evaluation order)."""
    en, de, fr = (stopword_count(text, l) for l in ("en", "de", "fr"))
    return (
        F.when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def quality_stats(text: Column) -> dict[str, Column]:
    """Length/type-token/punctuation/stopword quality signals."""
    toks = ws_tokens(text)
    n_tokens = F.size(toks)
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_types": F.size(F.array_distinct(toks)).cast("long"),
        "n_punct": F.size(
            F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
        ).cast("long"),
        "n_stopwords": stopword_count(text).cast("long"),
    }


def shingles(text: Column, k: int = 5, prefix_len: int | None = 200) -> Column:
    """Character k-shingles (over an optional prefix cap so signature
    cost is bounded per document).

    The lambda slices ``text`` itself, not a ``substring(text, 1,
    prefix_len)`` subexpression: an outer expression referenced inside
    a higher-order lambda is re-evaluated per element (interpreted),
    which would copy the prefix once per shingle — O(prefix²) per
    document.  Capping the sequence bound gives the same shingle set:
    ``substr(text, i, k) == substr(prefix, i, k)`` whenever
    ``i + k - 1 <= prefix_len``."""
    length = (
        F.least(F.length(text), F.lit(prefix_len))
        if prefix_len
        else F.length(text)
    )
    n = F.greatest(length - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: text.substr(i, F.lit(k)))


def word_shingles(text: Column, n: int = 3, max_words: int = 50) -> Column:
    """Word n-gram shingles over the first ``max_words`` tokens — the
    standard dedup shingle space for documents (far more
    discriminative than character shingles on natural text).

    Built as a ``zip_with`` chain over n-1 shifted copies of the token
    array, NOT ``transform(sequence(...), i -> slice(words, i, n))``:
    higher-order lambdas evaluate interpreted, and an outer expression
    referenced inside the lambda body is re-evaluated PER ELEMENT —
    the slice form re-split the text for every shingle, O(words²) per
    document (measured 3.0 s of a 4.5 s dedup query at sf0.1).  Here
    every array argument is evaluated once per row and the lambdas do
    one cheap concat per element.  Output is identical: ``concat_ws``
    skips the nulls zip_with pads with, so the short-document case
    (fewer than n words → one shingle of all words) falls out the
    same."""
    words = F.slice(F.split(text, " "), 1, max_words)
    cnt = F.greatest(F.size(words) - (n - 1), F.lit(1))
    acc = words
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(words, k + 1, max_words),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(acc, 1, cnt)


def fingerprint(text: Column, prefix_len: int = 200) -> Column:
    """Deterministic engine-portable document fingerprint: md5 of the
    sorted distinct 5-shingle set of the text prefix (rolling-window
    shingles ≈ a rolling-hash content signature, robust to word
    reordering of distant parts)."""
    sh = F.array_sort(F.array_distinct(shingles(text, 5, prefix_len)))
    return F.md5(F.concat_ws("\x1f", sh))


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for dedup keys / training corpora:
    lowercase → strip punctuation/symbols → collapse whitespace runs →
    trim.  Pure column algebra; composes with exact_dedup to make it
    punctuation/case-insensitive."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


# ---- PII scrubbing -------------------------------------------------
# Conservative, publicly-documented PII shapes for corpus scrubbing
# (the standard pre-training redaction pass): emails, IPv4 addresses,
# phone-like digit runs.  The pattern strings are shared verbatim with
# the DuckDB oracle SQL (both engines compile them — Java regex here,
# RE2 there — and the constructs used (char classes, {m,n}, \b, (?:))
# behave identically in both).  Replacement order is load-bearing and
# mirrored in the oracle: emails first (contain dots/digits), then
# IPv4 (dotted digit runs), then phones (bare digit runs) — each pass
# removes text a later, looser pattern could partially re-match.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# Precision tradeoff (deliberate, recall-over-precision): this matches
# ANY >=9-char run of digits/spaces/parens/dashes, so benign content —
# year ranges ("2010 - 2024"), ISBN/ID sequences, columns of numbers —
# is redacted as <PHONE> too.  That is the standard conservative
# stance for pre-training scrubs (a missed phone number is a leak; an
# over-redacted ID is noise).  Tightening to "7-15 digits total"
# requires a lookahead, which RE2 (the DuckDB oracle's engine) does
# not support — a stricter pattern would fork the Spark and oracle
# semantics this module deliberately keeps identical.  Deployments
# needing higher precision swap the constant; counts/scrub/oracle all
# follow it.
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document PII hit counts (on the RAW text, before scrubbing)."""
    return {
        "n_emails": F.size(
            F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))
        ).cast("long"),
        "n_ips": F.size(
            F.regexp_extract_all(text, F.lit(PII_IPV4_RE), F.lit(0))
        ).cast("long"),
        "n_phones": F.size(
            F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0))
        ).cast("long"),
    }


def scrub_pii(text: Column) -> Column:
    """Redact PII spans with typed placeholder tokens.  Pure per-row
    column algebra (three JVM regexp_replace passes, no shuffle, no
    UDF) — the shape that runs unchanged over a 100 TB documents
    table."""
    t = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(t, PII_PHONE_RE, "<PHONE>")


def repetition_signals(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    max_top_word_frac: float = 0.3,
    min_distinct_frac: float = 0.2,
):
    """Gopher-style word-repetition quality signals per document —
    the aggregate complement of the per-row :func:`quality_stats`
    (production corpus filters gate on repetition, which no per-row
    expression can see): word count, distinct-word count, the
    fraction held by the single most frequent word, mean word length,
    and a ``keep`` verdict from the standard repetition thresholds.

    Plan shape: explode to word rows → (doc, word) count → per-doc
    aggregate.  Two shuffles, both with map-side partial aggregation;
    state per task is (doc, word) pairs, never the corpus.  All
    arithmetic is integer-sum based (rounded only at the end), so the
    result is engine-portable and oracle-checkable.
    """
    from pyspark.sql import functions as F

    words = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    per_word = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    sig = per_word.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("_top"),
        F.sum(F.length("w") * F.col("c")).alias("_chars"),
    )
    top_frac = F.col("_top") / F.col("n_words")
    distinct_frac = F.col("n_distinct_words") / F.col("n_words")
    return sig.select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(distinct_frac, 6).alias("distinct_word_frac"),
        F.round(F.col("_chars") / F.col("n_words"), 6).alias("mean_word_len"),
        (
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (top_frac <= max_top_word_frac)
            & (distinct_frac >= min_distinct_frac)
        ).alias("keep"),
    )


def tfidf_keywords(
    docs,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-``k`` distinctive keywords per document by tf-idf — the
    classic corpus-statistics text op (keyword extraction / topic
    probes over a training corpus).

    Returns ``(doc_id, word, tf, df, score, rank)`` with ``score =
    round(tf * n_docs / df, 6)`` — a LINEARIZED idf: for ranking,
    ``tf·(N/df)`` orders the same way as ``tf·idf`` within a document
    whenever idf is any monotone function of ``N/df``, and unlike
    ``ln(N/df)`` it needs no transcendental function, so the score is
    bit-identical in every engine (IEEE integer-valued double
    multiply/divide are correctly rounded) — hash-oracle-checkable.
    Ties break on the word itself, so the top-k set is deterministic.

    Scale shape: token explode → per-(doc, word) partial-agg shuffle
    (tf) → per-word partial-agg on the tf rows (df — vocabulary-sized,
    broadcast back) → per-doc top-k window (groups bounded by per-doc
    vocabulary).  The corpus scan happens once; the 1×1 cross join
    attaching ``n_docs`` is a scalar literal, not a data join.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(
            F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("_n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n_docs))  # 1×1: scalar corpus size
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.col("_n_docs")
                / F.col("df"),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "word", "tf", "df", "score", "rank")
    )


def heavy_ngrams(
    docs,
    n: int = 2,
    top_k: int = 50,
    sample_sixteenths: int = 4,
    candidate_factor: int = 4,
    max_words: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Deterministic TWO-PASS heavy hitters over word n-grams: the
    100-TB formulation of ``top_ngrams``-style vocabulary analysis.

    A single corpus-wide ``groupBy(ngram)`` shuffles the ENTIRE
    vocabulary — at pretraining scale the bigram vocabulary is itself
    a multi-TB frame, and all of it moves to reducers to answer a
    top-50 question.  The classic fix is candidate-then-verify:

    - pass 1 (candidates): count n-grams over an md5-sampled
      subcorpus (``sample_sixteenths``/16 of docs — deterministic and
      engine-portable; the row predicate does not skip IO, but it
      shrinks the pass's SHUFFLE to the sample's vocabulary) and take
      the sample's top ``top_k * candidate_factor`` by (count DESC,
      ngram) — a TakeOrderedAndProject, never a full sort;
    - pass 2 (verify): broadcast the O(top_k) candidate list, join
      the full corpus's n-grams against it, and count EXACTLY — this
      shuffle carries at most ``top_k * candidate_factor`` groups of
      partial counts instead of the vocabulary.

    Net trade: two corpus scans with tiny shuffles instead of one
    scan with a vocabulary-sized shuffle — at pretraining scale the
    bigram vocabulary is the same order as the corpus itself, so the
    shuffle, not the scan, is the term that stops fitting.

    Counts in the result are EXACT corpus counts; the sampling only
    chooses WHICH n-grams are counted.  The documented approximation:
    a true heavy hitter missing from the sample's top candidates is
    absent from the output — by Chernoff a uniformly-sampled doc set
    sees any corpus-wide heavy n-gram w.h.p., and ``candidate_factor``
    is the safety margin (raising it is linear cost).  The guarantee
    presumes a frequency GAP: on a near-uniform vocabulary (every
    n-gram count within sampling noise of the rank-``top_k`` boundary)
    there are no heavy hitters to find and the selected tail is
    boundary noise — counts stay exact either way.  Both passes are
    mirrored policy-exactly by the SQL oracle (same md5 predicate,
    same tiebreaks), so the correctness gate value-checks the policy,
    like the capped-dedup keys.

    Returns ``(ngram, n)``: the candidates' exact-count top ``top_k``
    by (n DESC, ngram) — a total order, deterministic everywhere.
    """
    grams = word_ngram_frame(docs, n, max_words, id_col, text_col)
    cand = heavy_ngram_candidates(
        grams, top_k, sample_sixteenths, candidate_factor, id_col
    )
    return (
        grams.join(F.broadcast(cand), "ngram")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram"))
        .limit(top_k)
    )


def word_ngram_frame(
    docs,
    n: int = 2,
    max_words: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """One row per (id, word n-gram) — the shared explode that both
    :func:`heavy_ngrams` passes (and any caller wanting to compose the
    candidate pass with its own verify/report stage) run over."""
    return docs.select(
        F.col(id_col),
        F.explode(
            word_shingles(F.col(text_col), n=n, max_words=max_words)
        ).alias("ngram"),
    )


def heavy_ngram_candidates(
    grams,
    top_k: int = 50,
    sample_sixteenths: int = 4,
    candidate_factor: int = 4,
    id_col: str = "doc_id",
):
    """Pass 1 of :func:`heavy_ngrams` as a standalone frame: the
    md5-sampled subcorpus's top ``top_k * candidate_factor`` n-grams
    by (sample count DESC, ngram) — exposed so evidence queries can
    value-check the candidate set itself (how much the sample pass
    pruned) alongside the final top-k."""
    from vcfdbr_spark.operators.sampling import md5_bernoulli

    return (
        grams.filter(md5_bernoulli(F.col(id_col), sample_sixteenths))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("_sc"))
        .orderBy(F.col("_sc").desc(), F.col("ngram"))
        .limit(top_k * candidate_factor)
        .select("ngram")
    )
