"""Structured Streaming surfaces.

The reference is pure batch, but its chunked, checkpointed,
resumable ingest loop (pipeline/02-build-db.R:249-529) is exactly the
contract Structured Streaming provides natively: source offsets +
checkpointLocation replace the .progress.RData file, and
``Trigger.AvailableNow`` replaces the --end-chunk partial-run flag
(pipeline/02-build-db.R:34-38).  We expose:

- ``stream_events``: watermarked tumbling-window aggregation over an
  event stream — the streaming rendering of the batch
  ``events_hourly`` query (same logical plan, incremental state).
- ``stream_vcf_ingest``: file-source streaming VCF ingest.  Dense
  global ids can't come from a streaming window; ``foreachBatch``
  assigns per-batch dense ids continuing from the stored max —
  the exact analog of the reference's cross-chunk ``index_start``
  carry (pipeline/02-build-db.R:258-259, :522).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked windowed aggregation over a file-source stream.
    Late rows beyond the watermark are dropped from state — bounded
    memory at any scale."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain an aggregation stream into an in-memory table with
    AvailableNow (process-everything-then-stop) semantics."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str = "doc_id long, ts timestamp, text string",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: first-seen wins on the content hash,
    duplicate arrivals dropped from the stream — the streaming twin of
    ``operators.dedup.exact_dedup``.

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates``
    on a subset NOT containing the event-time column never evicts its
    state (unbounded growth on a long-running stream); the
    within-watermark variant expires each hash once it is older than
    the watermark, so state is genuinely bounded."""
    stream = spark.readStream.schema(schema).format("parquet").load(source_dir)
    return (
        stream.withColumn("text_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_user_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    running per-user event count / value total that survives across
    micro-batches (arbitrary state Spark's built-in windowed aggs
    can't express — e.g. this could carry ML feature state).

    State schema is explicit (n, total); each micro-batch updates the
    group's state from its Arrow batches and emits the running totals
    (update semantics).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)

    out_schema = "user_id long, n long, total double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [total]}
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_vcf_ingest(
    spark: SparkSession,
    vcf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    header_path: str,
) -> None:
    """Streaming VCF ingest: new VCF text files appearing in
    ``vcf_dir`` are parsed and appended to the variant_info parquet
    table, with dense ids continuing across batches via a driver-side
    max-id carry (the streaming analog of the reference's resumable
    chunk loop).

    Idempotency: ``foreachBatch`` is at-least-once, so each batch
    writes its own ``ingest_batch=<id>`` partition directory,
    deleting any partial remnant of the same batch FIRST (before the
    max-id read, so a retried batch recomputes the same id range).
    A replayed batch therefore overwrites itself instead of
    duplicating rows."""
    from vcfdbr_spark.operators.ids import with_dense_ids
    from vcfdbr_spark.schema import read_header
    from vcfdbr_spark.sources import vcf as vcf_mod

    header = read_header(header_path)
    lines = spark.readStream.format("text").load(vcf_dir)
    records = lines.filter(~F.col("value").startswith("#"))

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark_l = batch_df.sparkSession
        batch_path = f"{out_dir}/variant_info/ingest_batch={batch_id}"
        # drop any partial output of a previous attempt of THIS batch
        # before reading max(variant_id), keeping the id carry exact
        jvm = spark_l._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(batch_path)
        fs = jpath.getFileSystem(spark_l._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
        try:
            existing = spark_l.read.parquet(f"{out_dir}/variant_info")
            start = (existing.agg(F.max("variant_id")).first()[0] or 0) + 1
        except Exception:
            start = 1
        c = F.split(F.col("value"), "\t")
        parsed = batch_df.select(
            c.getItem(0).alias("chr"),
            c.getItem(1).try_cast("long").alias("start"),
            c.getItem(3).alias("ref"),
            c.getItem(4).alias("alt"),
            F.str_to_map(c.getItem(7), F.lit(";"), F.lit("=")).alias("_info"),
        ).filter(
            # same reject rules as the batch parser (sources/vcf.py):
            # multiallelic + unparseable-POS records never get ids
            ~F.col("alt").contains(",") & F.col("start").isNotNull()
        )
        keyed = with_dense_ids(
            parsed,
            ["chr", "start", "ref", "alt"],
            id_col="variant_id",
            start=start,
            bucket=F.struct(
                F.col("chr"), F.floor(F.col("start") / 1_000_000)
            ),
        )
        out_cols = [
            F.col("variant_id"),
            F.col("chr"),
            F.col("start"),
            (F.col("start") + F.length("ref") - 1).alias("end"),
            F.col("ref"),
            F.col("alt"),
        ]
        for fid, f_ in header.info.items():
            if fid == "CSQ":
                continue
            out_cols.append(
                vcf_mod._info_column(F.col("_info"), f_).alias(
                    vcf_mod.mangle_name(fid)
                )
            )
        keyed.select(*out_cols).write.mode("overwrite").parquet(batch_path)

    q = (
        records.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
