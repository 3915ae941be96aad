"""Tests for the baseline JPEG codec (extensions/jpegcodec.py) and its
wiring into the multimodal kernels — the round-4 verdict's last declared
stub boundary, now a REAL decoder matching the PNG precedent: encoder
fixtures are standards-compliant baseline JFIF (tables declared in-stream),
decode round-trips them within quantization error, and out-of-envelope /
malformed input refuses with None (-> the loud deterministic fake), never
silently-wrong pixels."""

import numpy as np
import pytest

from presto_workload_analyzer_spark.extensions.jpegcodec import (
    decode_jpeg_pixels,
    encode_jpeg,
)


def _gradient_rgb(w, h):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (
                (x * 255) // max(w - 1, 1),
                (y * 255) // max(h - 1, 1),
                ((x + y) * 255) // max(w + h - 2, 1),
            )
    return img


@pytest.mark.parametrize("w,h", [(24, 17), (8, 8), (33, 9)])
def test_rgb_roundtrip_within_quant_error(w, h):
    """4:4:4 encode -> decode: dims/channels exact, pixels within the
    uniform-8 quant tables' error envelope (tight: mean < 3, max < 20)."""
    img = _gradient_rgb(w, h)
    out = decode_jpeg_pixels(encode_jpeg(w, h, 3, img.tobytes()))
    assert out is not None
    ww, hh, ch, samples = out
    assert (ww, hh, ch) == (w, h, 3)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(dec - img.astype(int))
    assert err.mean() < 3 and err.max() < 20


def test_subsampled_roundtrip_exercises_upsampling():
    """4:2:0 chroma: the decoder's 2x2 upsample path. Luma stays tight;
    chroma error grows where chroma has gradients — bound loosely."""
    w, h = 24, 17
    img = _gradient_rgb(w, h)
    out = decode_jpeg_pixels(encode_jpeg(w, h, 3, img.tobytes(), subsample=True))
    assert out is not None
    ww, hh, ch, samples = out
    assert (ww, hh, ch) == (w, h, 3)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(dec - img.astype(int))
    assert err.mean() < 8 and err.max() < 48


def test_grayscale_roundtrip():
    g = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (9, 1))  # 9x32
    out = decode_jpeg_pixels(encode_jpeg(32, 9, 1, g.tobytes()))
    assert out is not None
    ww, hh, ch, samples = out
    assert (ww, hh, ch) == (32, 9, 1)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(9, 32).astype(int)
    assert np.abs(dec - g.astype(int)).max() <= 2


def test_flat_color_block_is_near_exact():
    """A flat 16x16 color block has only a DC coefficient — decode must be
    within rounding of exact (DCT/quant introduce no AC error)."""
    img = np.full((16, 16, 3), (200, 64, 120), dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(16, 16, 3, img.tobytes()))
    _, _, _, samples = out
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(16, 16, 3).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 2


def test_refuses_malformed_and_out_of_envelope():
    img = _gradient_rgb(16, 16)
    good = encode_jpeg(16, 16, 3, img.tobytes())
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only
    assert decode_jpeg_pixels(good[:40]) is None  # truncated before SOS
    # progressive frame (SOF2) loudly refused, not fake-decoded
    progressive = bytearray(good)
    sof = progressive.find(b"\xff\xc0")
    progressive[sof + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(progressive)) is None


def test_decode_media_uses_real_jpeg_pixels(spark):
    """Through the DataFrame kernel: a real JPEG payload must report its
    true dims and pixel mean — not the deterministic fake's shape."""
    from pyspark.sql import Row, functions as F
    from presto_workload_analyzer_spark.extensions import multimodal

    img = _gradient_rgb(24, 16)
    payload = encode_jpeg(24, 16, 3, img.tobytes())
    media = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(payload))]
    ).select(
        "doc_id",
        F.col("payload"),
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    [row] = multimodal.decode_media(media).collect()
    assert (row.width, row.height, row.n_channels) == (24, 16, 3)
    assert abs(row.mean_intensity - float(img.mean()) / 255.0) < 0.05


def test_resize_media_reencodes_jpeg_as_jpeg(spark):
    """resize_media on a JPEG payload: output payload is itself a valid
    baseline JPEG at the target dims whose pixels track the source's NN
    resample (not the truncate/pad fake)."""
    from pyspark.sql import Row, functions as F
    from presto_workload_analyzer_spark.extensions import multimodal

    img = _gradient_rgb(32, 24)
    payload = encode_jpeg(32, 24, 3, img.tobytes())
    media = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(payload))]
    ).select(
        "doc_id",
        F.col("payload"),
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    [row] = multimodal.resize_media(media, 16, 12).collect()
    out = decode_jpeg_pixels(bytes(row.payload))
    assert out is not None
    w, h, ch, samples = out
    assert (w, h, ch) == (16, 12, 3)
    assert row.meta.n_bytes == len(row.payload)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(12, 16, 3).astype(int)
    # NN reference from the ORIGINAL pixels; two lossy hops -> loose bound
    ref = img[(np.arange(12) * 24 // 12)][:, (np.arange(16) * 32 // 16)].astype(int)
    assert np.abs(dec - ref).mean() < 10
