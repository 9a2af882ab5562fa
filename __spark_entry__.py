"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's operator suite with
DuckDB oracles; implementations live in ``vcfdbr_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vcfdbr_spark.entry_queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    canonical per-gene rare-variant workload (SURVEY.md §3.2) over the
    simdata-derived VCF-shaped tables."""
    return QUERIES["vcfsim_filter_test"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # vcf_ingest_* read a deterministic fixture VCF from a fixed path;
    # materialize it up front so Spark and DuckDB see the same file
    # regardless of which side the driver runs first.
    from vcfdbr_spark.oracle_vcf import ensure_oracle_vcf

    ensure_oracle_vcf()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vcfdbr_spark.oracle_vcf import ensure_oracle_vcf

    ensure_oracle_vcf()
    return dict(ORACLE)
