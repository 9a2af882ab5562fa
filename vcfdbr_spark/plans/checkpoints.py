"""Eager materialization of small intermediate frames.

Two operators (``operators/pipeline.py::corpus_filter``,
``operators/lm.py::train_bigram_model``) materialize an O(survivors)
/ O(distinct-bigrams) scalar frame once so several consumers read the
stored rows instead of re-running the corpus subtree.  This module
centralizes the mechanism and its two production caveats:

- ``localCheckpoint`` blocks live until the JVM garbage-collects the
  RDD and the ContextCleaner runs — a long-lived driver invoking the
  operator in a loop accumulates blocks between GC cycles, and the
  blocks die with their executor (the job fails and is retried; fine
  for a minutes-long stage, not for a day-long one).
- With a CHECKPOINT DIR configured
  (``spark.sparkContext.setCheckpointDir(...)``), ``checkpoint()``
  writes to reliable storage instead: executor loss is survivable,
  and Spark deletes the files when the frame is GC'd if
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true``.

``eager_checkpoint`` picks reliable when the session has a checkpoint
dir (the production deployment sets one), local otherwise (tests,
single-JVM benches) — callers get the right durability for their
deployment without threading a flag through every operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_checkpoint_dir(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:
        return False


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` now and truncate its lineage: reliable
    ``checkpoint`` when the session has a checkpoint dir, else
    ``localCheckpoint`` (see module docstring for the trade)."""
    if has_checkpoint_dir(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
