from vcfdbr_spark.operators.ids import with_dense_ids

__all__ = ["with_dense_ids"]
