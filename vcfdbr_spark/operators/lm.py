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
3. scoring (default shape): bigram INSTANCE rows join the broadcast
   model map-side, then ONE per-doc reduction whose shuffle carries
   |docs| map-side-combined partials — scoring adds no corpus-sized
   shuffle (r12; the former per-(doc, prev, cur) pre-agg shuffled
   ~every instance and was the heaviest lm stage at sf1/sf5).  When
   the model outgrows the broadcast threshold, ``preaggregate=True``
   restores the pre-agg so repeated doc bigrams dedup before they
   cross the join shuffle.

At 100 TB the corpus-sized stages are the counts aggregation and the
scoring scan; the model table scales with *observed vocabulary*²,
not corpus size, so the join side stays comparatively small.

Caching contract (mirrors ``dedup_components``): with ``materialize``
(default) the returned MODEL frame is persisted and eagerly
materialized — it is the reusable index a production pipeline scores
many batches against — and every training intermediate is released
before return, so the model itself is the only net cache and the
CALLER releases it.  ``materialize=False`` takes no explicit
persist (the registered query / bench path, which must leave zero
net EXPLICIT cache per invocation); the bigram-count table is
instead checkpointed once when ``checkpoint_counts`` is on —
exchange reuse cannot deduplicate the three differently-pruned
consumer subtrees, so without the checkpoint the corpus is scanned
three times for training.  Whether that blocking write WINS is
size-dependent (it cost +22% at sf1 on an idle local[32] where the
scans overlap for free); ``lm_score``'s ``materialize_counts="auto"``
gate picks by corpus input size (``LM_COUNTS_GATE_BYTES``).

Float determinism (oracle parity): the per-bigram log-probability is
quantized to integer micro-bits (``round(log2(p) * 1e6)`` as BIGINT)
BEFORE any aggregation — integer sums are order-independent and
exact, so the engine's nondeterministic reduce order cannot perturb
the score (same pattern as the embedding quantization).  ``p`` itself
is a ratio of exact integers, and IEEE requires correctly-rounded
division, so both engines feed bit-identical doubles to ``log2``;
only a last-ulp libm difference could flip a quantized value, and
the 1e6 grid makes that a ~1e-8 event per distinct bigram.

The FINAL per-doc average is rounded in exact integer arithmetic
too: ``bits_per_bigram = ((2·S + N) div (2·N)) / 1e6`` where ``S`` =
summed micro-bits and ``N`` = bigram count — integer round-half-up
of the rational S/N, then one exact-integer-by-1e6 IEEE division.
The naive ``round(S/N/1e6, 6)`` failed the r11 sf1 gate on 3 of
34,050 docs: when S/N lands EXACTLY on a half-micro-bit boundary
(S ≡ N/2 mod N), Spark rounds the decimal expansion of the nearest
double (BigDecimal HALF_UP → may see ...49999 and round down) while
DuckDB rounds ``x*1e6`` recomputed in double arithmetic (may see
.5 exactly and round up) — engine-dependent answers on boundary
docs, invisible at sf0.01/sf0.1 where no doc hits a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcfdbr_spark.functions.text import ws_tokens

#: quantization grid for per-bigram log2 p (micro-bits).
LM_QUANT = 1_000_000

#: input-size gate for the self-trained counts materialization
#: (``lm_score(materialize_counts="auto")``): below this many corpus
#: input bytes the three training scans overlap on an idle box and
#: the blocking counts write COSTS time (measured +22% at sf1 on
#: local[32], BENCH_NOTES r11); above it — or whenever the input size
#: is unknowable (non-local URIs) — one stored counts table beats two
#: extra corpus passes.
LM_COUNTS_GATE_BYTES = 256 << 20


def _local_input_bytes(df: DataFrame) -> int | None:
    """Total size of ``df``'s file-backed inputs, or None when any
    input is not a readable local file (object stores, streaming,
    in-memory frames) — callers treat None as 'assume big'."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return total


def _conf_bytes(value: str) -> int:
    """Parse a Spark byte-size conf string ('10485760', '64MB',
    '10m', '-1') to bytes."""
    v = value.strip().lower()
    for suffix, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)]) * mult)
    return int(v)


def model_would_broadcast(model: DataFrame) -> bool:
    """Catalyst's own broadcastability signal for the scoring join's
    model side: the optimized plan's ``sizeInBytes`` estimate vs
    ``spark.sql.autoBroadcastJoinThreshold`` — the SAME comparison
    the planner makes when it chooses broadcast-hash over
    shuffle-join for that side.  Meaningful for a pre-trained model
    (persisted models report real InMemoryRelation stats; file-backed
    ones real scan sizes); for a LAZY self-trained model the estimate
    is the corpus scan size propagated through the aggregates — a
    vocab-sized table wearing a corpus-sized estimate — so callers
    must not consult this on that path (see ``lm_score``'s auto
    rule).  Unknown/disabled thresholds resolve to False."""
    spark = model.sparkSession
    try:
        thr = _conf_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        if thr <= 0:
            return False
        size = int(
            model._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return size <= thr
    except Exception:
        return True


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, prev, cur) — one row per bigram instance, lowercased
    whitespace tokens.  Documents with fewer than 2 tokens emit no
    rows (a 1-token doc has no bigram to score).

    (r14 note: a ``spread_scan`` of the input was tried here and
    REVERTED — interleaved A/B at sf0.1 measured lm_score 1.46× slower
    with it: the tokenize+zip_with expansion is too cheap per row for
    the extra text shuffle + broken scan/agg fusion to pay off, unlike
    the minhash shingle+md5 path where it stays.)"""
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
    bigrams: DataFrame,
    materialize: bool = True,
    checkpoint_counts: bool = True,
    min_count: int | None = None,
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
    explicit persist: with ``checkpoint_counts`` the bigram-count
    table is checkpointed once (``plans/checkpoints.py`` — reliable
    when a checkpoint dir is set, else local; released when the
    model frame is dropped) so the three consumers (model join,
    context totals, vocabulary) read the stored counts instead of
    re-running the corpus aggregation — exchange reuse provably
    never fires here (the consumer subtrees prune different columns,
    so their canonicalized exchanges differ; measured r10: the
    corpus was scanned FOUR times without the checkpoint).  Whether
    the stored table WINS is a size trade, not a law: the counts
    frame is ≪ corpus (observed-vocabulary²), so dropping two full
    corpus passes wins whenever the corpus scan dominates — but on a
    small corpus with idle cores the overlapping scans are free and
    the BLOCKING materialization costs wall-clock (measured +22% at
    sf1 on local[32]).  ``checkpoint_counts=False`` keeps the plan
    fully lazy (three overlapping scans); ``lm_score``'s ``"auto"``
    gate picks by corpus input size (``LM_COUNTS_GATE_BYTES``).

    ``min_count`` frequency-floors the MODEL: bigrams observed fewer
    than ``min_count`` times are pruned from the model table AFTER
    the context totals and vocabulary are taken (so the smoothing
    denominators keep the FULL mass), and a pruned bigram scores
    exactly like an unseen one — the add-1/2 miss probability
    ``1/(2·ctx + V)``, which the smoothing already reserves below
    every kept bigram of the same context.  This is the standard
    public n-gram-LM vocabulary bound: on a Zipf corpus ~half the
    bigram TYPES are singletons carrying ~none of the mass, so the
    model table (the join/broadcast side of every scoring batch — the
    term that grows with observed vocabulary rather than with the
    corpus scan) shrinks ~2× at min_count=2 with a bounded, smoothed
    score change.  ``None`` keeps every observed bigram (exact parity
    with the unfloored oracle).  NOTE: the shipped sf corpora have a
    near-constant ~950 bigram vocabulary (0 singletons at sf0.1+), so
    there the floor is a 100-TB-readiness knob, not a local speedup —
    measured in BENCH_NOTES r12."""
    counts = bigrams.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        counts = counts.persist()
    elif checkpoint_counts:
        from vcfdbr_spark.plans.checkpoints import eager_checkpoint

        counts = eager_checkpoint(counts)
    model = model_from_counts(counts, min_count=min_count)
    if materialize:
        model = model.persist()
        model.count()  # eager: safe to drop the counts cache now
        counts.unpersist()
    return model


def model_from_counts(
    counts: DataFrame, min_count: int | None = None
) -> DataFrame:
    """Build the smoothed model directly from a ``(prev, cur, c)``
    bigram-count table — the post-aggregation half of
    :func:`train_bigram_model`, factored out so a caller that already
    HAS the counts (because it derives other statistics from the same
    table — e.g. the zipf-floor evidence row's type/singleton census)
    can train without a second corpus bigram+aggregation pass.  The
    smoothing denominators (context totals, vocabulary) are taken
    from the FULL counts before any ``min_count`` pruning, exactly as
    in :func:`train_bigram_model` — pass the unpruned table.

    The caller owns the counts frame's lifetime: checkpoint or
    persist it if it feeds multiple consumers (the model subtree
    reads it three ways: model join, context totals, vocabulary)."""
    ctx = counts.groupBy("prev").agg(F.sum("c").alias("ctx_c"))
    vocab = counts.agg(
        F.count_distinct("cur").cast("long").alias("vocab")
    )
    if min_count is not None and min_count > 1:
        counts = counts.filter(F.col("c") >= min_count)
    p = (2 * F.col("c") + 1).cast("double") / (
        2 * F.col("ctx_c") + F.col("vocab")
    ).cast("double")
    return (
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


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_counts: bool | str = "auto",
    min_count: int | None = None,
    preaggregate: bool | str = "auto",
) -> DataFrame:
    """(id, n_bigrams, bits_per_bigram) — per-document cross-entropy
    under the bigram model (lower = more predictable text; extreme
    values in either direction flag gibberish / boilerplate).

    With ``model=None`` the model is trained on ``docs`` itself (the
    self-scored corpus shape: every doc bigram is in the model, so
    the join is inner).  ``materialize_counts`` gates the one
    blocking materialization on that path — the bigram-count table
    that training's three consumers would otherwise each recompute
    from the corpus: ``True`` checkpoints it (the plan then scans
    the documents source exactly once — pinned by the gated-on plan
    assert in tests/test_cli_plans.py) at the cost of a blocking
    write; ``False`` stays fully lazy (three overlapping corpus
    scans — cheaper on small corpora with idle executors, measured
    −22% at sf1 on local[32]); ``"auto"`` (default) checkpoints when
    the corpus input size reaches ``LM_COUNTS_GATE_BYTES`` or is
    unknowable — at 100 TB one stored vocab²-sized table always
    beats two extra corpus passes.  Production pipelines that score
    many batches should ``train_bigram_model(..., materialize=True)``
    once and pass the model in.

    With a pre-trained ``model``, an unseen bigram takes its add-1/2
    smoothed miss probability ``1/(2*ctx + V)`` for the bigram's
    context (``1/V`` when the context itself is unseen) via a left
    join — this is MONOTONE below every seen bigram of the same
    context (a seen bigram has ``(2c+1) >= 3`` over the same
    denominator), so never-seen gibberish can't out-score
    rare-but-valid text.

    ``min_count`` (self-trained path only) frequency-floors the
    model (see :func:`train_bigram_model`): a pruned doc bigram then
    scores through the SAME miss formula as an unseen one, so the
    scoring join switches from the inner-join shortcut (every doc
    bigram is in an unfloored self-trained model by construction) to
    the pre-trained path's left-join + miss coalesce.

    ``preaggregate`` picks the scoring-join shape.  ``False`` (the
    BROADCAST-MODEL regime, which the 64 MB threshold covers up to
    multi-million-type vocabularies): bigram INSTANCE rows join the
    model map-side and the per-doc reduction shuffles only |docs|
    map-side-combined partials — no corpus-sized shuffle anywhere in
    scoring (measured r12: the per-type pre-agg was the single
    heaviest lm stage at sf1/sf5, 7.9 of 11.9 s, while its shuffle
    carried ~every bigram instance as a (doc, prev, cur) group).
    ``True`` pre-aggregates per (doc, prev, cur) BEFORE the join.
    ``"auto"`` (default) resolves to the instance shape in EVERY
    regime — measured, not assumed (BENCH_NOTES r13): the ADVICE-r12
    suggestion of keying the choice on the model-size-vs-broadcast-
    threshold signal was implemented and A/B-measured with broadcast
    DISABLED, and the instance shape still won 1.8× at sf1 — the
    pre-agg adds a SECOND instance-sized shuffle (its groupBy) before
    the join shuffle, so non-broadcastability alone never justifies
    it.  What does is per-doc bigram REPETITION: the pre-agg's
    groupBy shrinks the join input by the mean per-doc repetition
    factor k, so it wins when k ≳ 2 (measured: 1.6× faster on a
    k≈199 boilerplate corpus, same no-broadcast conf).  k is a
    corpus property the engine cannot see before training, so the
    high-repetition regime is an explicit caller opt-in
    (``preaggregate=True``), with :func:`model_would_broadcast`
    exposed as the companion diagnostic.  Identical results
    whichever shape runs (integer micro-bit sums commute)."""
    big = doc_bigrams(docs, text_col=text_col, id_col=id_col)
    trained_here = model is None
    floored = min_count is not None and min_count > 1
    if preaggregate == "auto":
        preaggregate = False
    if trained_here:
        if materialize_counts == "auto":
            nbytes = _local_input_bytes(docs)
            materialize_counts = (
                nbytes is None or nbytes >= LM_COUNTS_GATE_BYTES
            )
        model = train_bigram_model(
            big,
            materialize=False,
            checkpoint_counts=bool(materialize_counts),
            min_count=min_count,
        )
    if preaggregate:
        scored_in = big.groupBy(id_col, "prev", "cur").agg(
            F.count(F.lit(1)).alias("k")
        )
    else:
        scored_in = big.withColumn("k", F.lit(1))
    if trained_here and not floored:
        joined = scored_in.join(
            model.select("prev", "cur", "q"), ["prev", "cur"]
        )
    else:
        ctx_tbl = model.select("prev", "ctx_c").distinct()
        scalars = model.agg(F.max("vocab").alias("_v"))
        joined = (
            scored_in.join(
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
    # integer round-half-up of S/N micro-bits, THEN one exact
    # integer-by-1e6 division — boundary-deterministic across engines
    # (see module docstring, "Float determinism")
    out = (
        joined.groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("k") * F.col("q"))).cast("long").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.expr("(2 * _s + n_bigrams) div (2 * n_bigrams)").cast(
                    "double"
                )
                / F.lit(float(LM_QUANT))
            ).alias("bits_per_bigram"),
        )
    )
    return out
