"""Token-window document chunking — the context-window preprocessing
step of an LLM training / RAG pipeline: split every document into
fixed-size token chunks with a configurable overlap (stride).

Spark shape: pure per-row column algebra + ONE narrow ``explode`` —
tokens never leave the row until the chunk rows are emitted, there is
no shuffle, no UDF, and the plan is identical at 100 TB (each input
split maps to its own chunk rows; downstream consumers repartition as
they see fit).  Coverage invariant: with ``stride <= window`` every
token of every document lands in at least one chunk, including the
tail (the start sequence runs to the last token position, so the
final chunk is simply shorter than ``window`` instead of dropping the
remainder — contrast the stride-only tail gap called out for
``passage_windows``, which detects *repeats* and deliberately windows
differently).

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
    """(id, chunk_id, chunk_tokens, chunk_text) — whitespace-token
    windows of ``window`` tokens starting every ``stride`` tokens
    (default: no overlap, ``stride == window``).

    ``chunk_id`` is the 0-based window index; ``chunk_tokens`` the
    actual token count of the chunk (the tail chunk may be shorter).
    A document shorter than ``window`` yields exactly one chunk.
    """
    stride = window if stride is None else stride
    if not (1 <= stride <= window):
        raise ValueError(
            f"stride must be in [1, window]: stride={stride} window={window}"
        )
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    # 1-based start positions 1, 1+stride, ... up to the last token:
    # because stride <= window, the final window always reaches the
    # end of the document (tail-coverage invariant, pinned in tests).
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_t"),
            n.alias("_n"),
            F.explode(starts).alias("_st"),
        )
        .select(
            id_col,
            ((F.col("_st") - 1) / stride).cast("long").alias("chunk_id"),
            F.least(F.lit(window), F.col("_n") - F.col("_st") + 1)
            .cast("long")
            .alias("chunk_tokens"),
            F.array_join(
                F.slice(F.col("_t"), F.col("_st"), F.lit(window)), " "
            ).alias("chunk_text"),
        )
    )
