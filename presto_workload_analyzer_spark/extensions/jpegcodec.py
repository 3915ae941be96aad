"""Baseline JPEG (JFIF) codec with zero codec-library dependencies.

The multimodal kernel's PNG precedent (multimodal._decode_png_pixels)
extended to JPEG: `decode_jpeg_pixels` is a REAL baseline-sequential
decoder — marker walk, DQT/DHT table parse, Huffman entropy decode with
byte-unstuffing and restart markers, dequantize, 2-D IDCT (numpy matrix
form), nearest-neighbor chroma upsample for subsampled scans, YCbCr→RGB —
and `encode_jpeg` is a minimal matching encoder (4:4:4 or 4:2:0, uniform
quant tables, fixed-length canonical Huffman tables) used to build test
fixtures and to re-emit resized payloads, mirroring `_encode_png`.

Scope (returns None outside it, callers fall back): baseline DCT (SOF0),
8-bit precision, 1 or 3 components, sampling factors 1-2. Progressive
(SOF2), arithmetic coding, 12-bit, and CMYK are out of scope — real
corpora route those through a C codec; the SEMANTICS here are what ships.

Per-block Python + numpy is acceptable: this runs inside Arrow-batched
mapInPandas stages on executor-side payload bytes (never the driver), and
the cost profile is the per-image decode work any codec pays.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: index z -> (row, col); even diagonals run bottom-left
# to top-right, odd ones top-right to bottom-left (ITU T.81 figure 5)
_ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    _rs = range(min(_d, 7), max(0, _d - 7) - 1, -1) if _d % 2 == 0 else range(
        max(0, _d - 7), min(_d, 7) + 1
    )
    _ZIGZAG.extend((_r, _d - _r) for _r in _rs)

# orthonormal 8-point DCT-II basis: forward F = M @ f @ M.T, inverse
# f = M.T @ F @ M (M is orthogonal)
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers reset alignment via `sync_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past EOI: harmless
                self.n += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    # a real marker: stop feeding, pad with zeros
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        # truncate the consumed bit: without this the accumulator grows
        # into an O(stream-size) bigint and every subsequent shift is
        # O(len(acc)) — quadratic decode on real photos
        self.acc &= (1 << self.n) - 1
        return bit

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> bool:
        """Byte-align and consume an RSTn marker; True if one was found."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return True
            self.pos += 1
        return False


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code): symbol} (ITU T.81 annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def decode_jpeg_pixels(b: bytes) -> tuple[int, int, int, bytearray] | None:
    """(width, height, n_channels, row-major samples) of a baseline JPEG,
    or None for anything outside the supported envelope / malformed."""
    if b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
        frame = None
        restart_interval = 0
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI before SOS
                return None
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            seg = b[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables out of scope
                    vals = np.zeros((8, 8))
                    for z in range(64):
                        r, c = _ZIGZAG[z]
                        vals[r, c] = seg[p + 1 + z]
                    qt[tq] = vals
                    p += 65
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0x0F
                    counts = list(seg[p + 1 : p + 17])
                    n = sum(counts)
                    huff[(tc, th)] = _build_huffman(
                        counts, seg[p + 17 : p + 17 + n]
                    )
                    p += 17 + n
            elif marker == 0xC0:  # SOF0: baseline
                precision = seg[0]
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                if precision != 8 or ncomp not in (1, 3) or not w or not h:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
                if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                    return None
                frame = (w, h, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS: scan follows
                if frame is None:
                    return None
                ns = seg[0]
                scan = {}
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan[cid] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    b, i + 2 + seg_len, frame, scan, qt, huff, restart_interval
                )
            i += 2 + seg_len
        return None
    except (IndexError, ValueError, KeyError):
        return None


def _decode_scan(b, pos, frame, scan, qt, huff, restart_interval):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcu_cols * 8 * c["h"], mcu_rows * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                if not br.sync_restart():
                    return None
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_t, ac_t = huff.get((0, td)), huff.get((1, ta))
                if dc_t is None or ac_t is None:
                    return None
                q = qt.get(c["tq"])
                if q is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros((8, 8))
                        t = _decode_symbol(br, dc_t)
                        if t is None or t > 11:
                            return None
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        coef[0, 0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_t)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                return None
                            rr, cc = _ZIGZAG[k]
                            coef[rr, cc] = _extend(br.read_bits(s), s)
                            k += 1
                        block = _M.T @ (coef * q) @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
    # upsample each plane to full-resolution grid, crop, clamp
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, bytearray(out.tobytes())
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, bl)], axis=-1
    )
    return w, h, 3, bytearray(rgb.tobytes())


# ---------------------------------------------------------------------------
# Encoder: minimal valid baseline JFIF for fixtures + resized payloads.
# Tables are CUSTOM but fully declared in the stream (JPEG permits any
# valid tables; the decoder above — and any standards-compliant decoder —
# reads them from DQT/DHT), sidestepping the 330-literal standard tables:
#   quant: uniform 8s (low loss, keeps round-trip tests tight);
#   Huffman: canonical fixed-length — 12 5-bit DC symbols, 162 8-bit AC
#   symbols (162 < 255 codes available at length 8; never all-ones).
# ---------------------------------------------------------------------------

_Q_UNIFORM = np.full((8, 8), 8.0)
_DC_COUNTS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = bytes(_AC_SYMS)


def _encode_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (inverse of _build_huffman)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


_DC_ENC = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _encode_table(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> tuple[int, int]:
    """(size s, s-bit two's-variant code) for a DC diff / AC coefficient."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int) -> int:
    dc = int(coef[0, 0])
    s, bits = _category(dc - pred)
    bw.write(*_DC_ENC[s])
    if s:
        bw.write(bits, s)
    zz = [int(coef[r, c]) for r, c in _ZIGZAG]
    run = 0
    last_nz = max((z for z in range(1, 64) if zz[z]), default=0)
    for z in range(1, last_nz + 1):
        if zz[z] == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(*_AC_ENC[0xF0])
            run -= 16
        s, bits = _category(zz[z])
        bw.write(*_AC_ENC[(run << 4) | s])
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        bw.write(*_AC_ENC[0x00])  # EOB
    return dc


def encode_jpeg(
    width: int, height: int, channels: int, samples: bytes, subsample: bool = False
) -> bytes:
    """Baseline JFIF bytes for an 8-bit image. channels 1 (gray) or 3
    (RGB); subsample=True uses 4:2:0 chroma (exercises the decoder's
    upsampling path), else 4:4:4."""
    import struct

    if channels not in (1, 3):
        raise ValueError(f"encode_jpeg: channels must be 1 or 3, got {channels}")
    img = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, bch = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]
    sub = 2 if (subsample and channels == 3) else 1
    if sub == 2:
        hv = [(2, 2)] + [(1, 1)] * (len(planes) - 1)
    else:
        hv = [(1, 1)] * len(planes)
    hmax = max(hh for hh, _ in hv)
    vmax = max(vv for _, vv in hv)
    mcu_cols = -(-width // (8 * hmax))
    mcu_rows = -(-height // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        if ci > 0 and sub == 2:  # chroma: 2x2 box-mean downsample
            ph, pw = p.shape
            if ph % 2 or pw % 2:  # pad odd edges by replication first
                p = np.pad(p, ((0, ph % 2), (0, pw % 2)), mode="edge")
            p = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        th = mcu_rows * 8 * hv[ci][1]
        tw = mcu_cols * 8 * hv[ci][0]
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        padded.append(p)

    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, p in enumerate(padded):
                hh, vv = hv[ci]
                for by in range(vv):
                    for bx in range(hh):
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round((_M @ block @ _M.T) / _Q_UNIFORM)
                        preds[ci] = _encode_block(bw, coef, preds[ci])
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = bytes(int(_Q_UNIFORM[r, c]) for r, c in _ZIGZAG)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
