"""GIF pixel codec with zero codec-library dependencies.

Completes the multimodal codec line (PNG: multimodal._decode_png_pixels,
JPEG: extensions.jpegcodec): `decode_gif_pixels` is a REAL GIF87a/GIF89a
STATIC decoder — logical-screen + image-descriptor parse, global/local
color tables, full LZW decompression (variable code width, clear/EOI,
4096-entry dictionary), Adam-less 4-pass de-interlace, transparency via
the GIF89a graphic-control extension, first-frame composite onto the
logical screen — and `encode_gif` is a minimal matching encoder (single
frame, global color table, clear-code-flushed LZW so the code width never
grows) used for test fixtures.

Scope: the FIRST image frame (corpus/image work; animation belongs to the
frame-sample operator). Returns RGB (3 channels) — a transparent index
renders as the background color, matching how a static viewer flattens a
single frame. Malformed/truncated input returns None, never wrong pixels.
"""

from __future__ import annotations


class _LZWReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int | None:
        while self.n < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.n
            self.n += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray | None:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LZWReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = br.read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            reset()
            continue
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # out-of-range code: corrupt stream
        out += entry
        if len(out) > max_pixels:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out


def decode_gif_pixels(b: bytes) -> tuple[int, int, int, bytearray] | None:
    """(width, height, 3, row-major RGB samples) of the first frame of a
    GIF composited onto the logical screen, or None if malformed."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    try:
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        packed = b[10]
        bg_index = b[11]
        pos = 13
        gct: bytes = b""
        if packed & 0x80:
            n = 3 * (2 << (packed & 0x07))
            gct = b[pos : pos + n]
            pos += n
        if not sw or not sh:
            return None
        transparent = -1
        while pos < len(b):
            block = b[pos]
            if block == 0x21:  # extension
                label = b[pos + 1]
                pos += 2
                if label == 0xF9 and pos + 6 <= len(b):  # graphic control
                    size = b[pos]
                    if b[pos + 1] & 0x01:
                        transparent = b[pos + 4]
                    pos += size + 1
                # skip (remaining) sub-blocks
                while pos < len(b) and b[pos] != 0:
                    pos += b[pos] + 1
                pos += 1
            elif block == 0x2C:  # image descriptor
                left = int.from_bytes(b[pos + 1 : pos + 3], "little")
                top = int.from_bytes(b[pos + 3 : pos + 5], "little")
                iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
                ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
                ipacked = b[pos + 9]
                pos += 10
                table = gct
                if ipacked & 0x80:  # local color table
                    n = 3 * (2 << (ipacked & 0x07))
                    table = b[pos : pos + n]
                    pos += n
                if not table or not iw or not ih:
                    return None
                min_code_size = b[pos]
                pos += 1
                if not 2 <= min_code_size <= 11:
                    return None
                data = bytearray()
                while pos < len(b) and b[pos] != 0:
                    ln = b[pos]
                    data += b[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                pos += 1
                idx = _lzw_decode(min_code_size, bytes(data), iw * ih)
                if idx is None or len(idx) < iw * ih:
                    return None
                if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                    rows = [None] * ih
                    src = 0
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                        for y in range(start, ih, step):
                            rows[y] = idx[src * iw : (src + 1) * iw]
                            src += 1
                    idx = bytearray().join(bytes(r) for r in rows)

                def color(i: int) -> bytes:
                    c = table[3 * i : 3 * i + 3]
                    return c if len(c) == 3 else b"\x00\x00\x00"

                # background resolves in the GLOBAL color table per the GIF
                # spec — `table` may be a frame-local table where bg_index
                # means a different color entirely
                gbg = gct[3 * bg_index : 3 * bg_index + 3] if gct else b""
                bg = gbg if len(gbg) == 3 else b"\x00\x00\x00"
                out = bytearray(bg * (sw * sh))
                for y in range(min(ih, sh - top)):
                    for x in range(min(iw, sw - left)):
                        i = idx[y * iw + x]
                        if i == transparent:
                            continue
                        o = ((top + y) * sw + (left + x)) * 3
                        out[o : o + 3] = color(i)
                return sw, sh, 3, out
            elif block == 0x3B:  # trailer before any image
                return None
            else:
                return None
        return None
    except (IndexError, ValueError):
        return None


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Literal-only LZW: emit CLEAR whenever the table is about to force a
    width increase, so every pixel is a root code at constant width — a
    valid (if uncompressed) stream every decoder accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    flush_every = (1 << width) - clear - 2  # table slots before width bump
    out = bytearray()
    acc = 0
    n = 0

    def emit(code: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    emit(clear)
    for i, ix in enumerate(indices):
        if flush_every and i and i % flush_every == 0:
            emit(clear)
        emit(ix)
    emit(eoi)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    rgb: bytes,
    n_colors: int = 64,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a from row-major RGB samples. Colors quantize to
    a uniform 4x4x4 (n_colors=64) cube palette; `interlace` writes the
    4-pass row order (exercising the decoder's de-interlace)."""
    if n_colors != 64:
        raise ValueError("encode_gif: only the 64-color uniform cube is supported")
    # palette: r,g,b in {0,85,170,255}
    pal = bytearray()
    for r in range(4):
        for g in range(4):
            for b2 in range(4):
                pal += bytes((r * 85, g * 85, b2 * 85))
    pal += b"\x00" * (3 * (128 - 64))  # pad table to 2^7 entries

    def q(v: int) -> int:
        return (v + 42) // 85 if v < 234 else 3

    idx = bytearray()
    ys = list(range(height))
    if interlace:
        ys = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
    for y in ys:
        for x in range(width):
            o = (y * width + x) * 3
            idx.append(q(rgb[o]) * 16 + q(rgb[o + 1]) * 4 + q(rgb[o + 2]))

    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes((0x80 | 0x06, 0, 0))  # GCT present, 2^(6+1)=128 entries
    out += pal
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    min_code_size = 7
    out += bytes([min_code_size])
    stream = _lzw_encode(min_code_size, bytes(idx))
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
