"""Token-window document chunking — the context-window preprocessing
step of an LLM training / RAG pipeline: split every document into
fixed-size token chunks with a configurable overlap (stride).

Spark shape: pure per-row column algebra + ONE narrow ``posexplode``
— tokens never leave the row until the chunk rows are emitted, there
is no shuffle, no UDF, and the plan is identical at 100 TB (each
input split maps to its own chunk rows; downstream consumers
repartition as they see fit).

Coverage invariant: with ``stride <= window`` every token of every
document lands in at least one chunk — the stride start sequence is
clamped at the LAST FULL window position (``n - window + 1``) and one
tail start at exactly that position is unioned in (deduplicated when
the stride already lands there), the same clamped-tail scheme as
``passage_windows`` (operators/dedup.py).  Running starts all the way
to the last token would instead emit trailing chunks that are strict
suffixes of the previous chunk — duplicate content shipped into the
downstream index / training set.

No analog in the reference (it chunks VCF scan ranges, not text —
``pipeline/01-convert-vcf.R``'s chunking is the scan-planning
ancestor of this op); chunking here follows the public
fixed-window-with-overlap scheme used by retrieval and pre-training
pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcfdbr_spark.functions.text import ws_tokens


def chunk_documents(
    docs: DataFrame,
    window: int = 2048,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, w_start, chunk_tokens, chunk_text) —
    whitespace-token windows of ``window`` tokens starting every
    ``stride`` tokens (default: no overlap, ``stride == window``).

    ``chunk_id`` is the 0-based window index (position in the
    ascending start list); ``w_start`` the 1-based token position the
    chunk begins at; ``chunk_tokens`` the actual token count (only a
    document shorter than ``window`` yields a short — single — chunk;
    the tail chunk of a longer doc is a full window clamped to end at
    the last token).
    """
    stride = window if stride is None else stride
    if not (1 <= stride <= window):
        raise ValueError(
            f"stride must be in [1, window]: stride={stride} window={window}"
        )
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    # stride starts clamped at the last full-window position, plus
    # the tail start itself; array_union dedupes when the stride
    # sequence already ends there, and preserves ascending order, so
    # posexplode's index is the chunk number
    last_start = F.greatest(n - (window - 1), F.lit(1))
    starts = F.array_union(
        F.sequence(F.lit(1), last_start, F.lit(stride)),
        F.array(last_start),
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_t"),
            n.alias("_n"),
            F.posexplode(starts).alias("_idx", "_st"),
        )
        .select(
            id_col,
            F.col("_idx").cast("long").alias("chunk_id"),
            F.col("_st").cast("long").alias("w_start"),
            F.least(F.lit(window), F.col("_n") - F.col("_st") + 1)
            .cast("long")
            .alias("chunk_tokens"),
            F.array_join(
                F.slice(F.col("_t"), F.col("_st"), F.lit(window)), " "
            ).alias("chunk_text"),
        )
    )
