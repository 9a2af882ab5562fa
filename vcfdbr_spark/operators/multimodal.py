"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the decode hooks ship
with REAL stdlib-only decoders for the formats the stdlib can parse:
PNG (``decode_png``: zlib inflate + scanline unfilter, 8-bit
gray/RGB/RGBA) and PCM WAV (``decode_wav``: ``wave`` module, 8/16-bit,
deterministic signal stats), dispatched by ``decode_content``; every
other format raises ``NotImplementedError``, and ``fake_decode``
remains the deterministic stand-in the value oracle pins (the
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
is identical for all decoders).

Scale notes: binary payloads ride in their own column so column
pruning skips them unless a stage touches them; ``mapInPandas``
streams Arrow batches (bounded memory per task); metadata extraction
is pure column algebra on a small prefix.
"""

from __future__ import annotations

import struct
import zlib
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, list[float]]:
    """Stdlib-only PNG decode → ``(width, height, features)``.

    Supports the dominant variant (8-bit depth, gray/RGB/RGBA, no
    interlace): chunk walk → IHDR dims → concatenated-IDAT zlib
    inflate → per-scanline unfilter (None/Sub/Up/Average/Paeth).
    The 8-dim feature vector is deterministic pixel statistics in
    [0, 1]: mean r, g, b, alpha, mean/min/max luma (BT.601 weights),
    and channel count / 4.

    This is the driver-free REAL decode path for ``decode_media`` —
    pure-Python per-pixel loops are fine for thumbnails/tests; a
    production deployment swaps in a vectorized decoder with the SAME
    signature, which is the entire point of the hook.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG byte stream")
    pos = 8
    idat = bytearray()
    width = height = color_type = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG variant (bit_depth={bit_depth}, "
                    f"color_type={color_type}, interlace={interlace}); "
                    f"supported: 8-bit gray/RGB/RGBA, no interlace"
                )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel payload has the wrong length")
    prev = bytearray(stride)
    pixels = bytearray()
    i = 0
    for _ in range(height):
        f = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if f == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - nch] if x >= nch else 0
                ul = prev[x - nch] if x >= nch else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        pixels += line
        prev = line
    n_px = width * height
    sums = [0] * nch
    luma_sum = 0.0
    luma_min, luma_max = 1.0, 0.0
    for p in range(0, len(pixels), nch):
        for c in range(nch):
            sums[c] += pixels[p + c]
        if nch == 1:
            luma = pixels[p] / 255.0
        else:
            luma = (
                0.299 * pixels[p]
                + 0.587 * pixels[p + 1]
                + 0.114 * pixels[p + 2]
            ) / 255.0
        luma_sum += luma
        luma_min = min(luma_min, luma)
        luma_max = max(luma_max, luma)
    means = [s / n_px / 255.0 for s in sums]
    if nch == 1:
        r = g = b = means[0]
        a = 1.0
    elif nch == 3:
        r, g, b = means
        a = 1.0
    else:
        r, g, b, a = means
    feats = [r, g, b, a, luma_sum / n_px, luma_min, luma_max, nch / 4.0]
    return width, height, feats


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 2
) -> bytes:
    """Minimal PNG writer (filter 0 scanlines) — the test-side twin of
    :func:`decode_png`; also handy for emitting decoded thumbnails."""
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def _chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_image(content: bytes) -> tuple[int, int, list[float]]:
    """Real decoder hook: PNG decodes natively (:func:`decode_png`);
    every other format needs a library this container doesn't have."""
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    raise NotImplementedError(
        "only PNG decodes natively here; other image formats require "
        "an image library not present in this container — inject a "
        "decoder or use fake_decode for plumbing tests"
    )


def decode_wav(data: bytes) -> tuple[int, int, list[float]]:
    """Real stdlib-only WAV (RIFF PCM) decoder — the audio analog of
    :func:`decode_png` (same "no media libs in the container, so
    decode the container format we CAN with the stdlib" stance).

    The shared ``DECODED_SCHEMA`` is image-shaped; for audio its
    (width, height) slots carry ``(sample_rate, n_channels)``.  The
    8-dim feature vector is deterministic signal stats, exact up to
    single float divisions of integer sums:

    ``[duration_s, n_channels, sample_width_bytes, mean|amp| ch0,
    mean|amp| ch1 (0 if mono), peak|amp|, zero-crossing rate (ch0),
    n_frames]``   (amplitudes normalized to full scale).

    PCM 8-bit (unsigned) and 16-bit (signed LE) — the wave-module
    formats — are supported; anything else raises, mirroring the
    non-PNG image path.
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sw == 1:
        samples = [b - 128 for b in raw]
        full = 128.0
    elif sw == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
        full = 32768.0
    else:
        raise NotImplementedError(
            "PCM 8/16-bit WAV only — wider samples need an audio "
            "library this container doesn't have"
        )
    per_ch_mean = []
    for c in range(min(nch, 2)):
        ch = samples[c::nch]
        per_ch_mean.append(
            sum(abs(s) for s in ch) / len(ch) / full if ch else 0.0
        )
    while len(per_ch_mean) < 2:
        per_ch_mean.append(0.0)
    peak = max((abs(s) for s in samples), default=0) / full
    ch0 = samples[0::nch] if nch else []
    zc = sum(1 for a, b in zip(ch0, ch0[1:]) if (a >= 0) != (b >= 0))
    zcr = zc / (len(ch0) - 1) if len(ch0) > 1 else 0.0
    dur = nframes / rate if rate else 0.0
    feats = [
        dur,
        float(nch),
        float(sw),
        per_ch_mean[0],
        per_ch_mean[1],
        peak,
        zcr,
        float(nframes),
    ]
    return rate, nch, feats


def encode_wav(
    rate: int, n_channels: int, samp_width: int, frames: bytes
) -> bytes:
    """Inverse of :func:`decode_wav` for tests (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(samp_width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_content(content: bytes) -> tuple[int, int, list[float]]:
    """Format-dispatching real-decoder hook for mixed media tables:
    PNG → :func:`decode_png`, RIFF/WAVE → :func:`decode_wav`; other
    formats raise (inject a decoder, or use :func:`fake_decode` for
    plumbing tests)."""
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    raise NotImplementedError(
        "only PNG and PCM WAV decode natively here; other formats "
        "require media libraries not present in this container"
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
