"""Tests for the static GIF codec (extensions/gifcodec.py) and its wiring
into the multimodal kernels — with PNG and JPEG already real, this closes
the image side of the codec line (video frame sampling is the one
remaining declared stub). The encoder's only loss is its 64-color uniform
palette, so decode must reproduce the QUANTIZED source exactly — LZW,
interlace, composite offsets and transparency are all bit-checkable."""

import numpy as np
import pytest

from presto_workload_analyzer_spark.extensions.gifcodec import (
    decode_gif_pixels,
    encode_gif,
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


def _quantize(img):
    """The encoder's 4x4x4 cube: v -> 255 if v >= 234 else (v+42)//85*85."""
    q = ((img.astype(int) + 42) // 85) * 85
    return np.where(img >= 234, 255, q)


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_is_exact_after_palette_quantization(interlace):
    w, h = 21, 13
    img = _gradient_rgb(w, h)
    out = decode_gif_pixels(encode_gif(w, h, img.tobytes(), interlace=interlace))
    assert out is not None
    ww, hh, ch, samples = out
    assert (ww, hh, ch) == (w, h, 3)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.array_equal(dec, _quantize(img))


def test_lzw_width_growth_path():
    """A large frame forces the decoder's dictionary past several width
    bumps when fed by a real (growing) LZW stream — our encoder emits
    clear-flushed literals, so instead make the DECODER grow by checking
    a frame big enough that the literal stream still exercises multi-
    sub-block reassembly (>255-byte chunks)."""
    w, h = 64, 48
    img = _gradient_rgb(w, h)
    gb = encode_gif(w, h, img.tobytes())
    out = decode_gif_pixels(gb)
    assert out is not None
    dec = np.frombuffer(bytes(out[3]), dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.array_equal(dec, _quantize(img))


def test_refuses_malformed():
    img = _gradient_rgb(16, 16)
    good = encode_gif(16, 16, img.tobytes())
    assert decode_gif_pixels(b"nope") is None
    assert decode_gif_pixels(b"GIF89a\x10\x00") is None  # truncated header
    assert decode_gif_pixels(good[:40]) is None  # truncated mid-table
    # corrupt LZW byte: must never raise — either a clean refusal (None)
    # or a well-formed result tuple (flip may land in decodable territory)
    broken = bytearray(good)
    broken[-20] ^= 0xFF
    got = decode_gif_pixels(bytes(broken))
    assert got is None or (len(got) == 4 and got[0] == 16 and got[1] == 16)


def test_decode_media_uses_real_gif_pixels(spark):
    from pyspark.sql import Row, functions as F
    from presto_workload_analyzer_spark.extensions import multimodal

    img = _gradient_rgb(24, 16)
    payload = encode_gif(24, 16, img.tobytes())
    media = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))]).select(
        "doc_id",
        F.col("payload"),
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    [row] = multimodal.decode_media(media).collect()
    assert (row.width, row.height, row.n_channels) == (24, 16, 3)
    want_mean = float(_quantize(img).mean()) / 255.0
    assert abs(row.mean_intensity - want_mean) < 1e-6


def test_resize_media_reencodes_gif_as_gif(spark):
    from pyspark.sql import Row, functions as F
    from presto_workload_analyzer_spark.extensions import multimodal

    img = _gradient_rgb(32, 24)
    payload = encode_gif(32, 24, img.tobytes())
    media = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))]).select(
        "doc_id",
        F.col("payload"),
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    [row] = multimodal.resize_media(media, 16, 12).collect()
    out = decode_gif_pixels(bytes(row.payload))
    assert out is not None
    w, h, ch, samples = out
    assert (w, h, ch) == (16, 12, 3)
    assert row.meta.n_bytes == len(row.payload)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(12, 16, 3).astype(int)
    # NN-resample the quantized source; requantization is idempotent on
    # palette values, so the round trip stays exact
    qsrc = _quantize(img)
    ref = qsrc[(np.arange(12) * 24 // 12)][:, (np.arange(16) * 32 // 16)]
    assert np.array_equal(dec, ref)
