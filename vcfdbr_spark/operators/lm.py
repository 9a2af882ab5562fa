"""Bigram language-model quality scoring — the perplexity-filter
family of LLM data pipelines (CCNet-style by public description:
score each document by how predictable its text is under an n-gram
LM; outlier-perplexity docs are gibberish or boilerplate and get
filtered).  Here the LM is a bigram model with add-1/2 (Jeffreys)
smoothing trained on the corpus itself; the score is the document's
cross-entropy in bits per bigram.

Spark shape (all built-in column algebra, no UDFs):

1. bigram extraction: per-row ``zip_with`` of two token-array slices
   + ONE narrow explode — no shuffle;
2. model training: ``groupBy(prev, cur).count()`` with map-side
   combine [shuffle 1, output = distinct-bigram table, |model| ≪
   corpus]; context totals from the model itself (``groupBy(prev)``,
   shuffle 2 over the already-small model); vocabulary size attached
   as a 1×1 broadcast scalar (same documented cartesian-free
   exemption pattern as tf-idf's n_docs);
3. scoring: doc bigrams pre-aggregated per (doc, prev, cur) [shuffle
   3, map-side combine] then joined to the model [shuffle 4 — AQE
   broadcasts the model when it fits, shuffles otherwise] and
   reduced per doc [shuffle 5, tiny].

At 100 TB the corpus-sized stages are the two map-side-combined
aggregations; the model table scales with *observed vocabulary*²,
not corpus size, so the join side stays comparatively small.

Caching contract (mirrors ``dedup_components``): with ``materialize``
(default) the returned MODEL frame is persisted and eagerly
materialized — it is the reusable index a production pipeline scores
many batches against — and every training intermediate is released
before return, so the model itself is the only net cache and the
CALLER releases it.  ``materialize=False`` takes no explicit
persist (the registered query / bench path, which must leave zero
net EXPLICIT cache per invocation); the bigram-count table is
instead ``localCheckpoint``ed once — exchange reuse cannot
deduplicate the three differently-pruned consumer subtrees, so
without the checkpoint the corpus would be scanned three times for
training (see ``train_bigram_model``).

Float determinism (oracle parity): the per-bigram log-probability is
quantized to integer micro-bits (``round(log2(p) * 1e6)`` as BIGINT)
BEFORE any aggregation — integer sums are order-independent and
exact, so the engine's nondeterministic reduce order cannot perturb
the score (same pattern as the embedding quantization).  ``p`` itself
is a ratio of exact integers, and IEEE requires correctly-rounded
division, so both engines feed bit-identical doubles to ``log2``;
only a last-ulp libm difference could flip a quantized value, and
the 1e6 grid makes that a ~1e-8 event per distinct bigram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcfdbr_spark.functions.text import ws_tokens

#: quantization grid for per-bigram log2 p (micro-bits).
LM_QUANT = 1_000_000


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, prev, cur) — one row per bigram instance, lowercased
    whitespace tokens.  Documents with fewer than 2 tokens emit no
    rows (a 1-token doc has no bigram to score)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
    )
    return docs.select(
        F.col(id_col), F.explode(pairs).alias("_b")
    ).select(id_col, F.col("_b.prev").alias("prev"), F.col("_b.cur").alias("cur"))


def train_bigram_model(
    bigrams: DataFrame, materialize: bool = True
) -> DataFrame:
    """(prev, cur, q, ctx_c, vocab) — the smoothed model: ``q`` is
    the per-bigram log2-probability in integer micro-bits,

        p(cur | prev) = (c + 1/2) / (ctx + V/2)
                      = (2c + 1) / (2*ctx + V)

    with ``c`` the bigram count, ``ctx`` the context total (sum of
    counts for ``prev``, carried as ``ctx_c`` for miss-floor scoring
    of new batches) and ``V`` the observed vocabulary size (distinct
    ``cur``, carried as ``vocab``).

    ``materialize`` persists + eagerly materializes the returned
    model (the reusable scoring index) and releases the training
    intermediates before returning — the model is then the ONLY net
    cache and the caller unpersists it when done.  ``False`` takes no
    explicit persist: the bigram-count table is ``localCheckpoint``ed
    (eager, ContextCleaner-released when the model frame is dropped —
    the same contract as ``dedup_components``) so the three consumers
    (model join, context totals, vocabulary) read the stored
    counts instead of re-running the corpus aggregation.  This is NOT
    an optional micro-optimization: the three consumer subtrees prune
    different columns, so their canonicalized exchanges differ and
    Spark's exchange reuse provably never fires here — without the
    checkpoint the corpus is scanned and bigram-aggregated three
    times (verified in the executed plan; pinned by the single-scan
    plan assert in tests/test_cli_plans.py).  The counts table is the
    distinct-bigram frame (≪ corpus — observed-vocabulary², not
    corpus-sized), so storing it once to drop two full corpus passes
    is the right trade at any scale."""
    counts = bigrams.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        counts = counts.persist()
    else:
        counts = counts.localCheckpoint(eager=True)
    ctx = counts.groupBy("prev").agg(F.sum("c").alias("ctx_c"))
    vocab = counts.agg(
        F.count_distinct("cur").cast("long").alias("vocab")
    )
    p = (2 * F.col("c") + 1).cast("double") / (
        2 * F.col("ctx_c") + F.col("vocab")
    ).cast("double")
    model = (
        counts.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))  # 1x1 scalar attach (documented)
        .select(
            "prev",
            "cur",
            F.round(F.log2(p) * LM_QUANT).cast("long").alias("q"),
            "ctx_c",
            "vocab",
        )
    )
    if materialize:
        model = model.persist()
        model.count()  # eager: safe to drop the counts cache now
        counts.unpersist()
    return model


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, bits_per_bigram) — per-document cross-entropy
    under the bigram model (lower = more predictable text; extreme
    values in either direction flag gibberish / boilerplate).

    With ``model=None`` the model is trained on ``docs`` itself (the
    self-scored corpus shape: every doc bigram is in the model, so
    the join is inner).  The self-trained path takes no explicit
    persist; training ``localCheckpoint``s the bigram-count table
    once (ContextCleaner-released), so the whole score costs TWO
    corpus passes — one for training counts, one for per-doc bigrams
    — and the plan scans the documents source exactly once (plan
    assert in tests/test_cli_plans.py).  Production pipelines that
    score many batches should ``train_bigram_model(...,
    materialize=True)`` once and pass the model in.

    With a pre-trained ``model``, an unseen bigram takes its add-1/2
    smoothed miss probability ``1/(2*ctx + V)`` for the bigram's
    context (``1/V`` when the context itself is unseen) via a left
    join — this is MONOTONE below every seen bigram of the same
    context (a seen bigram has ``(2c+1) >= 3`` over the same
    denominator), so never-seen gibberish can't out-score
    rare-but-valid text."""
    big = doc_bigrams(docs, text_col=text_col, id_col=id_col)
    trained_here = model is None
    if trained_here:
        model = train_bigram_model(big, materialize=False)
    per_doc = big.groupBy(id_col, "prev", "cur").agg(
        F.count(F.lit(1)).alias("k")
    )
    if trained_here:
        joined = per_doc.join(
            model.select("prev", "cur", "q"), ["prev", "cur"]
        )
    else:
        ctx_tbl = model.select("prev", "ctx_c").distinct()
        scalars = model.agg(F.max("vocab").alias("_v"))
        joined = (
            per_doc.join(
                model.select("prev", "cur", "q"), ["prev", "cur"], "left"
            )
            .join(ctx_tbl, "prev", "left")
            .crossJoin(F.broadcast(scalars))
            .withColumn(
                "q",
                F.coalesce(
                    F.col("q"),
                    F.round(
                        -F.log2(
                            (
                                2 * F.coalesce(F.col("ctx_c"), F.lit(0))
                                + F.col("_v")
                            ).cast("double")
                        )
                        * LM_QUANT
                    ).cast("long"),
                ),
            )
        )
    out = joined.groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.round(
            -F.sum(F.col("k") * F.col("q")).cast("double")
            / F.lit(float(LM_QUANT))
            / F.sum("k").cast("double"),
            6,
        ).alias("bits_per_bigram"),
    )
    return out
