"""vcfdbr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tkoomar/VCFdbR.

The reference (/root/reference, R + SQLite) is a batch ETL pipeline that
converts a VCF into three linked relational tables plus a thin SQL query
surface (see SURVEY.md).  This package re-expresses that capability —
and extends it with large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) — as idiomatic
Spark DataFrame programs: declarative plans optimized by Catalyst,
columnar Parquet storage standing in for SQLite's secondary indexes.
"""

from vcfdbr_spark.session import get_spark

__all__ = [
    "get_spark",
    "read_vcf",
    "write_vcfdb",
    "open_vcfdb",
    "build_vcfdb_resumable",
    "append_vcf",
    "exact_dedup",
    "minhash_dedup_pairs",
    "dedup_components",
    "dedup_keep_best",
    "incremental_dedup_pairs",
    "write_band_index",
    "read_band_index",
    "compact_band_index",
    "index_n_pfx",
    "cap_per_group",
    "sample_exact_k",
    "domain_mix_sample",
    "epoch_shuffle",
    "scrub_pii",
    "pii_counts",
    "corpus_filter",
    "quality_pass_frame",
    "decontaminate_splits",
    "decontaminate_batch",
    "snapshot_delta",
    "pack_shuffled",
    "write_ivf_index",
    "ivf_topk_indexed",
    "ivf_list_stats",
    "read_ivf_centroids",
    "stream_fuzzy_dedup",
    "stream_semantic_dedup",
    "stream_exact_dedup",
    "stream_corpus_filter",
    "stream_decontaminate",
    "stream_ivf_assign",
]
__version__ = "0.2.0"


def __getattr__(name: str):
    """Lazy re-exports of the primary API (avoids importing pyspark
    submodules before a session exists)."""
    if name == "read_vcf":
        from vcfdbr_spark.sources.vcf import read_vcf

        return read_vcf
    if name in ("write_vcfdb", "open_vcfdb"):
        from vcfdbr_spark.sources import store

        return getattr(store, name)
    if name in ("build_vcfdb_resumable", "append_vcf"):
        from vcfdbr_spark.sources import build

        return getattr(build, name)
    if name in (
        "exact_dedup",
        "minhash_dedup_pairs",
        "dedup_components",
        "dedup_keep_best",
        "incremental_dedup_pairs",
        "write_band_index",
        "read_band_index",
        "compact_band_index",
        "index_n_pfx",
    ):
        from vcfdbr_spark.operators import dedup

        return getattr(dedup, name)
    if name in (
        "cap_per_group",
        "sample_exact_k",
        "domain_mix_sample",
        "epoch_shuffle",
    ):
        from vcfdbr_spark.operators import sampling

        return getattr(sampling, name)
    if name in ("scrub_pii", "pii_counts"):
        from vcfdbr_spark.functions import text

        return getattr(text, name)
    if name in (
        "corpus_filter",
        "quality_pass_frame",
        "decontaminate_splits",
        "decontaminate_batch",
    ):
        from vcfdbr_spark.operators import pipeline

        return getattr(pipeline, name)
    if name == "snapshot_delta":
        from vcfdbr_spark.operators.delta import snapshot_delta

        return snapshot_delta
    if name == "pack_shuffled":
        from vcfdbr_spark.operators.packing import pack_shuffled

        return pack_shuffled
    if name in (
        "write_ivf_index",
        "ivf_topk_indexed",
        "ivf_list_stats",
        "read_ivf_centroids",
    ):
        from vcfdbr_spark.operators import similarity

        return getattr(similarity, name)
    if name in (
        "stream_fuzzy_dedup",
        "stream_semantic_dedup",
        "stream_exact_dedup",
        "stream_corpus_filter",
        "stream_decontaminate",
        "stream_ivf_assign",
    ):
        from vcfdbr_spark.streaming import ingest

        return getattr(ingest, name)
    raise AttributeError(name)
