"""Round-13 additions: stream-vs-batch parity as one driver row, the
planted-Zipf LM floor evidence, the definitional baselines' |Q| freeze
above the sf1 tier, and lm_score's preaggregate="auto" join-shape
selection."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from tools.check_correctness import TABLES, normalize, table_scan

SF001 = "/root/testdata/sf0.001"


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan({table_scan(sf_dir, t)})"
        )
    return con


def _sorted_rows(rows):
    return sorted(map(tuple, rows))


def test_lm_preaggregate_shapes_agree_and_auto_resolves(spark):
    """The three scoring-join shapes (instance-level, per-type
    pre-agg, auto) are value-identical (integer micro-bit sums
    commute); "auto" resolves to the instance shape in every regime
    (the measured rule — see lm_score's docstring and BENCH_NOTES
    r13) including the no-broadcast one, and the companion
    model_would_broadcast diagnostic tracks Catalyst's threshold."""
    from vcfdbr_spark.operators.lm import (
        doc_bigrams,
        lm_score,
        model_would_broadcast,
        train_bigram_model,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = _sorted_rows(lm_score(docs, preaggregate=False).collect())
    b = _sorted_rows(lm_score(docs, preaggregate=True).collect())
    c = _sorted_rows(lm_score(docs).collect())  # auto, self-trained
    assert a == b == c

    model = train_bigram_model(doc_bigrams(docs), materialize=True)
    try:
        # persisted model reports REAL InMemoryRelation stats: tiny
        # vocab -> broadcasts under the default threshold
        assert model_would_broadcast(model)
        d = _sorted_rows(lm_score(docs, model=model).collect())
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        try:
            # the diagnostic flips with the threshold; auto's RESULT
            # stays correct either way
            assert not model_would_broadcast(model)
            e = _sorted_rows(lm_score(docs, model=model).collect())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert d == e == a
    finally:
        model.unpersist()


def test_conf_bytes_parses_spark_size_strings():
    from vcfdbr_spark.operators.lm import _conf_bytes

    assert _conf_bytes("10485760") == 10 << 20
    assert _conf_bytes("64MB") == 64 << 20
    assert _conf_bytes("10m") == 10 << 20
    assert _conf_bytes("1g") == 1 << 30
    assert _conf_bytes("512k") == 512 << 10
    assert _conf_bytes("-1") == -1
    assert _conf_bytes("100b") == 100


def test_all_baseline_oracles_carry_the_freeze():
    """Every definitional-baseline oracle interpolates the same |Q|
    freeze predicate the Spark side applies; the non-baseline IVF
    keys (trained/indexed — engine paths, not ground-truth timers)
    must NOT."""
    import vcfdbr_spark.entry_queries as eq

    for sql in (
        eq.SQL_EMBEDDING_TOPK,
        eq.SQL_EMBEDDING_LSH_TOPK,
        eq.SQL_EMBEDDING_IVF_TOPK,
        eq.SQL_LSH_RECALL,
    ):
        assert eq._BASELINE_Q_FREEZE_SQL in sql
    assert eq._BASELINE_Q_FREEZE_SQL not in eq.SQL_EMBEDDING_IVF_TRAINED_TOPK


def test_baseline_q_freeze_above_sf1_matches_oracle(spark, tmp_path):
    """End-to-end freeze parity at a REAL above-threshold corpus:
    20,500 deterministic vectors (> _BASELINE_Q_FREEZE_ABOVE) — the
    Spark query and the DuckDB oracle must both freeze |Q| to the
    sf0.1 id universe and agree value-for-value."""
    import vcfdbr_spark.entry_queries as eq

    n, d = eq._BASELINE_Q_FREEZE_ABOVE + 500, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000)
                .cast("double")
                / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    got = eq.q_embedding_topk(spark, str(tmp_path))
    qids = {r["query_id"] for r in got.select("query_id").distinct().collect()}
    assert qids == set(range(0, eq._BASELINE_Q_ID_CAP, 100))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = normalize(con.execute(eq.SQL_EMBEDDING_TOPK).df())
    gp = normalize(got.toPandas())
    pd.testing.assert_frame_equal(gp, want, check_dtype=False, check_exact=True)


def test_lm_zipf_floor_matches_oracle_and_shrinks_model(spark):
    """The planted-Zipf floor row value-matches its oracle at
    sf0.001 AND carries the model-shrink fact: >= _ZIPF_N_SINGLETONS
    singleton types observed, every one pruned from the kept model."""
    import vcfdbr_spark.entry_queries as eq

    got = normalize(eq.q_lm_zipf_floor(spark, SF001).toPandas())
    want = normalize(_duck(SF001).execute(eq.SQL_LM_ZIPF_FLOOR).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    row = got.iloc[0]
    assert row["n_singleton_types"] >= eq._ZIPF_N_SINGLETONS
    assert (
        row["n_model_kept"]
        <= row["n_bigram_types"] - eq._ZIPF_N_SINGLETONS
    )
    assert row["n_docs_scored"] > eq._ZIPF_N_SINGLETONS


def test_stream_batch_parity_matches_oracle(spark):
    """The combined stream-vs-batch row (decontaminate / semantic
    dedup / corpus filter) value-matches its replay oracle at
    sf0.001 — including the order-pinned first-seen-wins cfilter
    section."""
    import vcfdbr_spark.entry_queries as eq

    got = normalize(eq.q_stream_batch_parity(spark, SF001).toPandas())
    want = normalize(_duck(SF001).execute(eq.SQL_STREAM_BATCH_PARITY).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert set(got["part"]) == {"decon", "semantic", "cfilter"}
