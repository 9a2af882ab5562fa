"""Deterministic sampling (SURVEY §2 C13).

The reference samples with R's RNG (sample_n / sample_frac /
sample(1:max)); RNGs don't agree across engines, so the engine's
repeatable-sampling primitive is hash-keyed Bernoulli: keep a row iff
the first hex digit of md5(key) falls in the accepted set.  Rate is
k/16 per accepted digit; the same rows are selected on any engine,
any partitioning, any run — which is exactly what a reproducible
training-data pipeline wants from a sample.

Stratified variant: apply per-group accepted sets sized to the
desired per-stratum rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def md5_bernoulli(key: Column, sixteenths: int) -> Column:
    """Boolean keep-predicate with rate ``sixteenths``/16."""
    accepted = list(HEX_DIGITS[:sixteenths])
    return F.substring(F.md5(key.cast("string")), 1, 1).isin(accepted)


def deterministic_sample(
    df: DataFrame, key_col: str, sixteenths: int = 2
) -> DataFrame:
    """Engine-portable repeatable sample at rate ``sixteenths``/16."""
    return df.filter(md5_bernoulli(F.col(key_col), sixteenths))


def sample_exact_k(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """EXACTLY ``k`` rows, deterministic and engine-portable: every
    row is ranked by ``md5(key)`` — a uniform pseudo-random total
    order with no RNG/seed machinery — and the ``k`` smallest win.

    Scale shape: Catalyst compiles the orderBy+limit into
    ``TakeOrderedAndProject`` (plan-asserted in tests) — each
    partition emits its own size-k heap and the driver merges
    ``P·k`` rows, so a 100-TB corpus is sampled in ONE pass with NO
    global sort or shuffle.  The alternatives both fail a
    requirement: ``df.sample(fraction)`` returns a BINOMIAL row
    count (never exactly k), and a ``row_number`` window over a
    global order shuffles the entire corpus to rank it.

    Exact-k is inherently GROWTH-UNSTABLE (new rows can displace
    earlier picks — no exact-size sample can be stable); when
    membership stability under corpus growth matters use
    :func:`deterministic_sample` (fixed rate) or
    :func:`split_corpus` instead.  md5 ties are broken by the key.
    """
    rank = F.md5(F.col(key_col).cast("string"))
    return df.orderBy(rank, F.col(key_col)).limit(k)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Per-group cap (corpus balancing): deterministically keep at
    most ``n`` rows per ``group_col``, ranked by the md5 of
    ``key_col`` (a stable engine-portable shuffle order, so the cap
    is repeatable and RNG-free) with the raw key as tiebreak.

    Scale shape — the naive single window per group sorts each
    ENTIRE group in one task; when one group is half the corpus
    (English on the web), that task gets half the data.  Two phases
    fix it: (1) a per-(group, input-partition) local rank caps each
    partition's contribution to ``n`` rows — any row below its
    partition's top-``n`` cannot be in the group's global top-``n``,
    so the filter is exact; (2) the global window then ranks at most
    ``n × num_partitions`` survivors per group.  Emits ``rank_col``
    (1-based) alongside the input columns.

    Recompute-safe despite using ``spark_partition_id``: a global
    top-``n`` row is within the top-``n`` of ANY partition it can land
    in (a subset preserves relative order), so it survives phase 1
    under every pid assignment — pid influences only which
    already-doomed rows are discarded early, never the result (cf. the
    ids.py rule: pid must never define persisted semantics).
    """
    from pyspark.sql import Window

    local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    pre = (
        df.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= n)
        .drop("_lrk")
    )
    glob = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        pre.withColumn(rank_col, F.row_number().over(glob))
        .filter(F.col(rank_col) <= n)
        .withColumn(rank_col, F.col(rank_col).cast("long"))
    )


def quality_prune_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_num: int,
    keep_den: int,
    key_col: str = "doc_id",
    rank_col: str = "rk",
    keep_k_col: str = "keep_k",
    score_bucket: Column | None = None,
) -> DataFrame:
    """Per-group TOP-FRACTION quality pruning: keep the best
    ``keep_num/keep_den`` of every ``group_col`` by ``score_col`` —
    the per-domain curation cut of a training pipeline (one global
    score cutoff lets a high-scoring domain crowd every other domain
    out of the corpus; a per-domain fraction preserves the mixture
    while still dropping each domain's worst tail).

    The keep count is exact integer math over BIGINTs —
    ``k_g = ceil(n_g·num/den) = (n_g·num + den − 1) div den`` — so
    the same rows win on any engine: no float quantile, no
    interpolation-mode drift between engines' percentile definitions
    (cf. split_thresholds' exact-literal rule).  Ranking is
    (score DESC, key ASC): deterministic under score ties.  Every
    group keeps at least one row (ceil of a positive fraction).

    Scale shape = :func:`cap_per_group`'s two phases plus one cheap
    aggregate: (0) per-group counts → ``k_g``, a one-row-per-domain
    frame broadcast back to the corpus (domains are few; the corpus
    never shuffles for this); (1) a per-(group, input-partition)
    local rank discards every row below its partition's top-``k_g``
    — an exact superset of the global winners, since a global winner
    is within the top-``k_g`` of any partition it can land in; (2)
    the global per-group window ranks only survivors, capping the
    skewed-domain sort at ``min(n_g, k_g × num_partitions)`` rows.
    Recompute-safe despite ``spark_partition_id``: pid only chooses
    which already-doomed rows die early, never the result (ids.py
    rule).

    For a top-FRACTION prune the phase-1 bound is weak (``k_g`` is a
    constant share of ``n_g``, so the surviving domain is still
    ~``n_g·num/den`` rows in ONE window task).  ``score_bucket``
    removes that last single-task sort with the ids.py two-level
    scheme: pass a coarse MONOTONE function of the score alone (e.g.
    ``F.floor(F.col("n_chars") / 64)``) and the global rank becomes
    bucket-local rank + per-(group, bucket) broadcast prefix offsets
    — every (domain, score-band) sorts independently in parallel and
    the offsets frame is O(domains × bands), not O(rows).  Same
    answer on any partitioning (the bucket is a pure function of the
    data); equal scores always share a bucket, so the (score DESC,
    key) order is preserved exactly.

    Emits ``keep_k_col`` and ``rank_col`` (1-based, BIGINT) alongside
    the input columns.  A NULL ``group_col`` is its own group (the
    count attach is null-safe, matching the window's NULL-partition
    semantics); a SQL oracle over NULL-group data must join with
    ``IS NOT DISTINCT FROM`` to agree.
    """
    from pyspark.sql import Window

    if keep_den <= 0 or keep_num <= 0 or keep_num > keep_den:
        raise ValueError(
            f"keep fraction must be in (0, 1]: got {keep_num}/{keep_den}"
        )
    counts = df.groupBy(group_col).agg(
        F.expr(
            f"(count(1) * {keep_num} + {keep_den - 1}) div {keep_den}"
        ).alias(keep_k_col)
    )
    joined = df.join(
        F.broadcast(counts.withColumnRenamed(group_col, "_qp_g")),
        F.col(group_col).eqNullSafe(F.col("_qp_g")),
    ).drop("_qp_g")
    order = [F.col(score_col).desc(), F.col(key_col)]
    local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        *order
    )
    pre = (
        joined.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= F.col(keep_k_col))
        .drop("_lrk")
    )
    if score_bucket is None:
        glob = Window.partitionBy(group_col).orderBy(*order)
        ranked = pre.withColumn(
            rank_col, F.row_number().over(glob).cast("long")
        )
    else:
        # ids.py two-level rank, per group: bucket-local row_number +
        # broadcast per-(group, bucket) prefix offsets.  The offsets
        # cum-sum window orders buckets DESC to match the score DESC
        # rank direction; its frame is one row per (group, bucket).
        with_b = pre.withColumn("_sb", score_bucket)
        w_off = (
            Window.partitionBy(group_col)
            .orderBy(F.col("_sb").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = (
            with_b.groupBy(group_col, "_sb")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn(
                "_off",
                F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long"),
            )
            .drop("_cnt")
            .withColumnRenamed(group_col, "_qp_og")
            .withColumnRenamed("_sb", "_qp_ob")
        )
        w_local = Window.partitionBy(group_col, "_sb").orderBy(*order)
        ranked = (
            with_b.join(
                F.broadcast(offsets),
                F.col(group_col).eqNullSafe(F.col("_qp_og"))
                & F.col("_sb").eqNullSafe(F.col("_qp_ob")),
            )
            .drop("_qp_og", "_qp_ob")
            .withColumn(
                rank_col,
                (F.row_number().over(w_local) + F.col("_off")).cast("long"),
            )
            .drop("_sb", "_off")
        )
    return ranked.filter(F.col(rank_col) <= F.col(keep_k_col))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, int]
) -> DataFrame:
    """Per-stratum deterministic sampling; ``rates`` maps stratum
    value → sixteenths (strata not listed are dropped)."""
    pred = F.lit(False)
    for stratum, sixteenths in rates.items():
        pred = pred | (
            (F.col(stratum_col) == stratum)
            & md5_bernoulli(F.col(key_col), sixteenths)
        )
    return df.filter(pred)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    base_rate: float,
    weight_cap: int = 400,
) -> DataFrame:
    """Deterministic IMPORTANCE sampling: keep a row with probability
    ``base_rate · min(weight, weight_cap)/weight_cap`` — quality- or
    length-weighted corpus downsampling, RNG-free and engine-portable
    (same rows on any engine, any partitioning, any re-run).

    Keep test is pure integer math: the first 8 md5 hex chars of the
    key give u ∈ [0, 2³²); the row stays iff
    ``u < floor(2³²·base_rate · min(w, cap)/cap)`` — both sides exact
    BIGINTs in every engine (no float RNG, no rounding drift).
    """
    u = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    scale = float(2**32) * base_rate
    thr = F.floor(
        F.lit(scale) * F.least(F.col(weight_col), F.lit(weight_cap)) / weight_cap
    ).cast("long")
    return df.filter(u < thr)


def split_thresholds(
    fractions: tuple[tuple[str, float], ...],
) -> list[tuple[int, str]]:
    """Cumulative integer thresholds over [0, 2³²) for
    :func:`split_corpus` — computed once in Python so the Spark plan
    and the SQL oracle interpolate the SAME exact BIGINT literals.
    The last split takes the remainder (no threshold)."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if len(fractions) < 2:
        raise ValueError("need at least 2 splits")
    # validate EVERY fraction, including the remainder split: e.g.
    # (.5, .5, 0.0) sums to 1 but would silently produce an empty
    # final split (its predecessor's threshold reaches 2³²)
    for name, frac in fractions:
        if frac <= 0:
            raise ValueError(f"split {name!r} has non-positive fraction")
    out: list[tuple[int, str]] = []
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        out.append((int(float(2**32) * cum), name))
    return out


def split_corpus(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = ":split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the leakage-safe
    dataset-split step of a training pipeline, as pure per-row column
    algebra (zero shuffle, runs at the scan at any corpus size).

    ``u`` = first 8 md5 hex chars of ``key || salt`` ∈ [0, 2³²); the
    row's split is the first cumulative integer threshold above ``u``
    (exact BIGINT comparisons — no float RNG, no rounding drift, same
    answer on any engine / partitioning / re-run).  The ``salt``
    decorrelates the split from every other md5-keyed decision on the
    same key (sampling, bench probes): without it, ``val`` would be a
    deterministic subset of every md5 sample's complement.

    Properties that matter at 100 TB: a document's split is a pure
    function of its key — re-ingesting, repartitioning, or GROWING the
    corpus never moves an existing doc across splits (eval-set
    stability / no train-test leakage on incremental builds).
    Per-stratum proportions hold in expectation (``u`` is independent
    of every column); pipelines needing EXACT per-stratum counts
    should rank per stratum instead (one shuffle — ``cap_per_group``'s
    two-phase shape).
    """
    return df.withColumn(
        split_col, split_assign_col(F.col(key_col), fractions, salt)
    )


def split_assign_col(
    key: Column,
    fractions: tuple[tuple[str, float], ...],
    salt: str = ":split",
) -> Column:
    """The split assignment of :func:`split_corpus` as a standalone
    Column expression over any key — because the split is a PURE
    function of the key, consumers (e.g. cross-split decontamination)
    can evaluate membership on derived frames (pair endpoints, probe
    batches) without joining back to the corpus."""
    u = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    col = None
    for thr, name in split_thresholds(fractions):
        cond = u < F.lit(thr)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return col.otherwise(fractions[-1][0])


def _u32(key: Column) -> Column:
    """First 8 md5 hex chars of ``key`` as a BIGINT in [0, 2³²) — the
    uniform deterministic uniform-variate every md5-keyed decision in
    this module shares (mirrored in SQL by ``entry_queries._hex8_sql``)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def domain_mix_sample(
    df: DataFrame,
    targets: dict[str, float],
    key_col: str = "doc_id",
    domain_col: str = "lang",
    weight_col: str = "n_chars",
    seed: str = "mix",
) -> DataFrame:
    """Resample a corpus to a TARGET DOMAIN MIXTURE — the
    mixture-weighting step of an LLM data pipeline (web/books/code/…
    shares are tuned, not taken as crawled).  Returns the LARGEST
    deterministic subsample whose per-domain ``weight_col`` totals
    (chars/tokens/bytes) are exactly proportional to ``targets`` in
    expectation, without upsampling any row.

    Math: with observed per-domain weight ``W_d`` and target share
    ``t_d``, the binding domain is the one with the smallest
    ``W_d / t_d`` (relative to its target it is the scarcest); its
    keep-rate is 1 and every other domain keeps
    ``rate_d = c · t_d / W_d`` with ``c = min_d(W_d / t_d)``, so kept
    weight per domain is ``c · t_d`` — proportional to the targets and
    maximal.  ``targets`` need not sum to 1 (only ratios matter);
    domains absent from ``targets`` are dropped.

    Determinism: the keep-test is ``u < floor(2³² · rate_d)`` where
    ``u`` is the md5 uniform of ``seed || ':' || key`` — a pure
    function of (key, corpus domain totals), so any engine, any
    partitioning, any run selects the same rows.  The thresholds are
    data-derived but use only IEEE double ops in a fixed nesting
    (``floor(2³² · ((c · t_d) / W_d))`` over exact BIGINT sums), so a
    SQL engine replaying the same formula reproduces them bit-exactly.

    Scale shape: pass 1 aggregates (domain, weight) only — column
    pruning keeps the scan narrow and the shuffle carries |domains|
    groups after map-side partial aggregation; the rates frame is a
    few rows, broadcast onto pass 2's filter, which runs at the scan.
    No global sort, no skew (the filter is stateless per row); the
    corpus is read twice, which is inherent to any data-calibrated
    rate (the alternative — caching 100 TB — is not).
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    for d, t in targets.items():
        if t <= 0:
            raise ValueError(f"target for domain {d!r} must be > 0")
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wtype = df.schema[weight_col].dataType
    if not isinstance(wtype, (ByteType, ShortType, IntegerType, LongType)):
        # a float weight sum is partition-order-dependent, which would
        # break the bit-exact threshold contract silently at the
        # margin — require exact integer weights (pre-quantize floats)
        raise ValueError(
            f"weight_col {weight_col!r} must be an integral column for "
            f"deterministic thresholds (got {wtype}); quantize float "
            f"weights first, e.g. CAST(quality * 1000 AS BIGINT)"
        )
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(d, float(t)) for d, t in sorted(targets.items())],
        f"{domain_col} string, t_d double",
    )
    w = df.groupBy(domain_col).agg(
        F.sum(weight_col).cast("double").alias("w_d")
    )
    from pyspark.sql import Window

    rates = w.join(F.broadcast(tgt), domain_col)
    # c = min_d(W_d / t_d) attached via an unpartitioned window over
    # the |domains|-row rates frame (tiny by construction — no
    # cartesian node, and the single-partition window is O(domains))
    c = F.min(F.col("w_d") / F.col("t_d")).over(Window.partitionBy())
    thr = rates.select(
        domain_col,
        F.floor(F.lit(float(2**32)) * ((c * F.col("t_d")) / F.col("w_d")))
        .cast("long")
        .alias("_thr"),
    )
    u = _u32(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    return (
        df.join(F.broadcast(thr), domain_col)
        .filter(u < F.col("_thr"))
        .drop("_thr")
    )


def _validate_n_buckets(n_buckets: int) -> None:
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0 or n_buckets > 2**32:
        raise ValueError("n_buckets must be a power of two in [1, 2^32]")


def shuffle_order_key(key: Column, epoch: Column, seed: str) -> Column:
    """order_key of the deterministic shuffle: md5-u32 of
    seed:epoch:key — THE single definition shared by
    :func:`epoch_shuffle` and ``packing.pack_shuffled`` (a drift here
    would silently desynchronize 'pack in epoch order' from the
    actual epoch order)."""
    return _u32(
        F.concat_ws(":", F.lit(seed), epoch.cast("string"), key.cast("string"))
    )


def shuffle_bucket(order_key: Column, n_buckets: int) -> Column:
    """Range bucket = the order_key's top bits (exact integer math in
    IEEE doubles because the power-of-two width divides 2³²)."""
    _validate_n_buckets(n_buckets)
    width = 2**32 // n_buckets
    return F.floor(order_key / F.lit(width)).cast("long")


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epochs: int = 1,
    n_buckets: int = 8,
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic GLOBAL TRAINING-ORDER SHUFFLE without a global
    sort: every (epoch, row) gets a uniform ``order_key`` =
    md5-u32 of ``seed:epoch:key`` and a ``bucket`` = the order_key's
    top bits.  Reading buckets in order and sorting WITHIN each
    bucket yields the exact global md5 order — i.e. a uniform
    pseudo-random permutation of the corpus, different per epoch —
    while each sort touches only ~1/n_buckets of the data.

    This is the standard distributed-shuffle decomposition: the
    bucket is a RANGE partition of the order key (equal-width on a
    uniform variate, so bucket sizes are balanced with no sampling
    step), and the plan is a pure projection — zero shuffle, zero
    sort; the consumer chooses parallelism by bucket count.  Epochs
    multiply rows via an exploded literal sequence (plan stays O(1)
    in epochs).  RNG-free: order is a pure function of
    (seed, epoch, key), so re-runs and engines agree and a training
    job can resume mid-epoch at an exact (bucket, order_key) cursor.

    ``n_buckets`` must be a power of two ≤ 2³² so the bucket edges
    ``i · 2³²/n_buckets`` are exact and bucket = floor(u / width)
    is exact integer math in IEEE doubles (u < 2³² is
    double-representable; width divides exactly).
    """
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    _validate_n_buckets(n_buckets)
    ep = df.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch"),
    )
    u = shuffle_order_key(F.col(key_col), F.col("epoch"), seed)
    return ep.select(
        F.col("epoch").cast("long").alias("epoch"),
        shuffle_bucket(u, n_buckets).alias("bucket"),
        u.alias("order_key"),
        F.col(key_col),
    )
