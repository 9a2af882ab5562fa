"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED (the container has no image/audio
libraries): ``decode_image`` raises ``NotImplementedError`` unless a
real decoder is injected, and ``fake_decode`` provides a
deterministic stand-in so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

Scale notes: binary payloads ride in their own column so column
pruning skips them unless a stage touches them; ``mapInPandas``
streams Arrow batches (bounded memory per task); metadata extraction
is pure column algebra on a small prefix.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(content: bytes) -> tuple[int, int, list[float]]:
    """Real decoder hook — not available in this environment."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; inject a decoder or use fake_decode for plumbing tests"
    )


def fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: derives (width, height) and an
    8-dim feature vector purely from the byte content."""
    n = len(content)
    width = (n % 64) + 1
    height = (n % 48) + 1
    feats = [float(content[i % n]) / 255.0 if n else 0.0 for i in range(8)]
    return width, height, feats


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, list[float]]] = fake_decode,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over a media table.

    The per-batch pandas function is the canonical shape for any
    CPU-heavy per-row media op (decode, resize, frame-sample): Spark
    streams Arrow batches into Python, the decoder runs vectorized
    per batch, and only the (small) typed result crosses back.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_bytes": [],
                "features": [],
            }
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                w, h, f = decoder(raw)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["features"].append(f)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index, derived from the (stub) frame count in metadata.  The
    actual pixel extraction is the stubbed decode step; the
    explode/partition shape is the real thing being exercised."""
    frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(frames - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
