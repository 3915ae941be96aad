"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns plus a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas stages over `mapInPandas`. The media codec libraries
are NOT in this container, so the pixel-level kernels are STUBBED with a
deterministic fake (clearly marked); the Spark-side plumbing — schema,
batch iteration, partitioning, UDF signatures — is real and tested, and a
real decoder drops into `_decode_bytes` without touching anything else.
`image_dims` is fully real: PNG/JPEG/GIF dimensions parsed straight from
container headers, no codec needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType()),
                T.StructField("n_bytes", T.LongType()),
            ]
        )),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_binary(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Demonstration source: utf-8 payload + metadata struct.

    In production the payload column comes straight from parquet binary;
    the metadata struct shape is the contract analyzers rely on.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_bytes(payload: bytes) -> tuple[int, int, int, float]:
    """STUB image decode — deterministic fake, NOT a real codec.

    A real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    the fake derives a plausible (width, height, channels, mean) from the
    byte content so downstream plumbing is exercised deterministically.
    """
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, 3, mean


DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _parse_image_dims(b: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL (not stubbed) container-header parse: PNG / JPEG / GIF
    dimensions from the first bytes, no codec library needed.

    PNG: 8-byte signature, IHDR width/height at offsets 16/20 (big-endian).
    GIF: 'GIF87a'/'GIF89a', logical screen w/h at 6/8 (little-endian).
    JPEG: walk marker segments to the first SOFn (C0-CF minus C4/C8/CC);
    height/width are bytes 3-6 of that segment's payload.
    Unknown/truncated input -> (None, None, None), never an exception.
    """
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                i += 2 + seg_len
    except (IndexError, ValueError):
        pass
    return None, None, None


def image_dims(media: DataFrame) -> DataFrame:
    """Binary payloads -> (doc_id, format, width, height), header-parsed.

    The one fully real multimodal kernel: dimensions come from the actual
    container bytes (see _parse_image_dims), so corpus filters like
    'drop images under 64px' run without any decode. Arrow-batched
    mapInPandas, payloads never leave the executors.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h = _parse_image_dims(bytes(payload))
                rows.append((doc_id, fmt, w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "format", "width", "height"])

    return media.select("doc_id", "payload").mapInPandas(gen, DIMS_SCHEMA)


def decode_media(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode stage: media frame -> decoded feature frame.

    mapInPandas keeps the payload bytes inside the executor (never on the
    driver) and amortizes Python transition cost per batch. Partitioning is
    inherited; repartition upstream by size if payloads are skewed.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, m = _decode_bytes(bytes(payload))
                rows.append((doc_id, w, h, c, m))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "mean_intensity"]
            )

    return media.select("doc_id", "payload").mapInPandas(gen, DECODED_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize stage: media frame -> media frame with resized payload.

    Real version decodes, resamples to (width, height), re-encodes —
    drop-in at the marked line. The fake deterministically truncates/pads
    the payload to width*height bytes so the contract every downstream
    stage relies on is exercised for real: same MEDIA_SCHEMA out as in,
    meta.n_bytes consistent with the new payload, partitioning inherited,
    payload bytes never leaving the executors.
    """
    target = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                resized = raw[:target].ljust(target, b"\0")  # <- real resample here
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": resized,
                        "meta": {"mime": meta["mime"], "n_bytes": len(resized)},
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """STUB video frame sampler: emits one row per sampled 'frame'.

    Real version: decode container, sample every Nth frame. The fake emits
    ceil(n_bytes / every_n_bytes) rows so the 1->N explode shape (and its
    partition growth) is real.
    """
    n_frames = F.ceil(F.col("meta.n_bytes") / every_n_bytes).cast("int")
    return media.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
