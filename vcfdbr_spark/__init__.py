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

__all__ = ["get_spark"]
__version__ = "0.1.0"
