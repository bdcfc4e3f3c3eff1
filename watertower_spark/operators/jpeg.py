"""Baseline JPEG codec — pure numpy + stdlib, no codec libs.

A REAL lossy compressed-image codec for the multimodal pipeline
(ITU-T T.81 baseline sequential DCT, Huffman entropy coding):

- ``encode_jpeg``: level shift → 8×8 FDCT (orthonormal DCT-II matrix)
  → quality-scaled quantization → zigzag → DC-diff / AC run-length →
  canonical Huffman bitstream with 0xFF byte stuffing.  Emits 4:4:4
  or 4:2:0 (box-averaged chroma) YCbCr, or single-component grayscale.
- ``decode_jpeg``: full marker walk (SOI/APPn/COM/DQT/DHT/SOF0/DRI/
  SOS/RSTn/EOI), Huffman tables and quant tables parsed FROM the
  stream (so any baseline encoder's tables work, not just ours),
  entropy decode with byte unstuffing and restart-interval predictor
  resets, dequantize → IDCT → chroma upsample (replication) → YCbCr→
  RGB.  Progressive (SOF2) / arithmetic / 12-bit raise ValueError into
  the multimodal (ok=false, err) row contract.

Quant/Huffman constants follow the public JPEG spec's Annex K
examples; because both are embedded in the stream (DQT/DHT) the
codec's correctness is table-independent and pinned by round-trip
tests (lossy: PSNR bounds; flat blocks: near-exact).  Per-block maths
is vectorized numpy; the bit-serial entropy loop is honest Python —
production throughput would slot PIL/libjpeg into decode_image's
dispatch without touching the dataflow (multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# Annex K quantization examples (public spec values)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order as (row, col) pairs, generated per the spec figure
ZIGZAG = [
    (i, s - i)
    for s in range(15)
    for i in (range(max(0, s - 7), min(s, 7) + 1) if s % 2
              else range(min(s, 7), max(0, s - 7) - 1, -1))
]
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

# orthonormal 8-point DCT-II matrix: coef = T @ block @ T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )
# JPEG's FDCT convention is 4x the orthonormal transform's DC gain;
# using the orthonormal matrix both ways keeps encode/decode consistent
# with the spec's dequantized-coefficient scale because we fold the
# factor into nothing: T is orthogonal, T.T @ (T @ B @ T.T) @ T == B.

# Huffman table specs per Annex K: (bits[1..16], values).  Embedded in
# DHT, so decoders never depend on these exact values.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _canonical_codes(bits: list, values: list) -> dict:
    """(symbol → (code, length)) per the spec's canonical assignment."""
    codes, code = {}, 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return codes


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling (public formula), clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple:
    """JPEG magnitude category + appended bits for a coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(bw: _BitWriter, blocks: np.ndarray, dc_codes: dict,
                   ac_codes: dict, pred: int) -> int:
    """Entropy-encode quantized zigzagged (n, 64) blocks; return new
    DC predictor."""
    for blk in blocks:
        size, bits = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(bits, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
    return pred


def _plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), FDCT + quantize + zigzag
    every 8×8 block; returns (n_blocks_y, n_blocks_x, 64) int32."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
    q = np.round(coef / qt).astype(np.int32)
    return q[:, :, _ZZ_ROWS, _ZZ_COLS]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2).clip(0, 255)


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray → baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (box-averaged chroma, 2×2-interleaved
    MCUs); default is 4:4:4.  Gray input emits a single-component scan."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg takes uint8 pixels")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 density, no thumbnail

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        zz = qt[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    # SOF0
    hv_y = 0x22 if (subsample and not gray) else 0x11
    comps = [(1, hv_y, 0)] if gray else [(1, hv_y, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += struct.pack(">BBB", cid, hv, tq)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, spec: tuple) -> bytes:
        bits, values = spec
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)

    # SOS
    scomps = [(1, 0x00)] if gray else [(1, 0x00), (2, 0x11), (3, 0x11)]
    sos = bytes([len(scomps)])
    for cid, tabs in scomps:
        sos += struct.pack(">BB", cid, tabs)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    bw = _BitWriter()

    if gray:
        blocks = _plane_blocks(pixels, qt_l)
        _encode_blocks(bw, blocks.reshape(-1, 64), dc_l, ac_l, 0)
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample:
            # pad to even, box-average 2×2 for chroma
            pe_h, pe_w = -(-h // 2) * 2, -(-w // 2) * 2
            def half(p):
                p = np.pad(p, ((0, pe_h - h), (0, pe_w - w)), mode="edge")
                return p.reshape(pe_h // 2, 2, pe_w // 2, 2).mean(axis=(1, 3))
            yb = _plane_blocks(y, qt_l)
            cbb = _plane_blocks(half(cb), qt_c)
            crb = _plane_blocks(half(cr), qt_c)
            # MCU = 2×2 luma blocks + 1 Cb + 1 Cr; luma block grid padded
            # to even so every MCU has its 4 Y blocks
            my, mx = cbb.shape[:2]
            if yb.shape[0] < 2 * my or yb.shape[1] < 2 * mx:
                yb = np.pad(yb, ((0, 2 * my - yb.shape[0]),
                                 (0, 2 * mx - yb.shape[1]), (0, 0)),
                            mode="edge")
            preds = [0, 0, 0]
            for r in range(my):
                for c in range(mx):
                    preds[0] = _encode_blocks(
                        bw, yb[2 * r:2 * r + 2, 2 * c:2 * c + 2].reshape(-1, 64),
                        dc_l, ac_l, preds[0])
                    preds[1] = _encode_blocks(bw, cbb[r, c][None], dc_c, ac_c, preds[1])
                    preds[2] = _encode_blocks(bw, crb[r, c][None], dc_c, ac_c, preds[2])
        else:
            planes = [(_plane_blocks(y, qt_l), dc_l, ac_l),
                      (_plane_blocks(cb, qt_c), dc_c, ac_c),
                      (_plane_blocks(cr, qt_c), dc_c, ac_c)]
            by, bx = planes[0][0].shape[:2]
            preds = [0, 0, 0]
            for r in range(by):
                for c in range(bx):
                    for i, (blocks, dcc, acc) in enumerate(planes):
                        preds[i] = _encode_blocks(bw, blocks[r, c][None],
                                                  dcc, acc, preds[i])

    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data) - 1:
            # entropy data ran out without a trailing marker (T.81 decoders
            # must see EOI/RSTn); keep the exception type consistent for
            # direct callers — Spark pipelines catch Exception either way
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_after_marker(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_huffman(br: _BitReader, tree: dict) -> int:
    node = tree
    for _ in range(16):
        node = node.get(br.bit())
        if node is None:
            raise ValueError("invalid JPEG Huffman code")
        if not isinstance(node, dict):
            return node
    raise ValueError("JPEG Huffman code longer than 16 bits")


def _build_tree(bits: list, values: list) -> dict:
    tree: dict = {}
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            node = tree
            for d in range(length - 1, -1, -1):
                b = (code >> d) & 1
                if d == 0:
                    node[b] = values[vi]
                else:
                    node = node.setdefault(b, {})
            vi += 1
            code += 1
        code <<= 1
    return tree


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w, 3) RGB (gray broadcast to RGB)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG stream")
    pos = 2
    qts: dict = {}
    dc_trees: dict = {}
    ac_trees: dict = {}
    sof = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them so a filler 0xFF is never read as a
        # marker code of 0xFF with a bogus length
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("JPEG stream ended before SOS")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT — possibly several tables per segment
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                tbl = np.zeros((8, 8), dtype=np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    seg[sp + 1:sp + 65], dtype=np.uint8).astype(np.int32)
                qts[tq] = tbl
                sp += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                values = list(seg[sp + 17:sp + 17 + nv])
                (ac_trees if cls else dc_trees)[tid] = _build_tree(bits, values)
                sp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            smap = {}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                smap[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(payload, pos + seglen, sof, smap, qts,
                                dc_trees, ac_trees, restart)
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG stream has no SOS")


def _decode_scan(payload, pos, sof, smap, qts, dc_trees, ac_trees, restart):
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                               dtype=np.float64))
    preds = [0] * len(comps)
    br = _BitReader(payload, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            # skip to and consume the RSTn marker, reset predictors
            p = br.pos
            while payload[p] != 0xFF or payload[p + 1] == 0x00:
                p += 1
            if not (0xD0 <= payload[p + 1] <= 0xD7):
                raise ValueError("expected JPEG restart marker")
            br.pos = p + 2
            br.align_after_marker()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            td, ta = smap[c["id"]]
            qt = qts.get(c["tq"])
            if qt is None:
                raise ValueError(f"missing quant table {c['tq']}")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    try:
                        blk = _decode_block(br, dc_trees[td], ac_trees[ta])
                    except _MarkerHit as exc:
                        raise ValueError(
                            f"JPEG entropy data ended early (marker {exc.marker:#x})"
                        ) from None
                    preds[ci] += int(blk[0])
                    blk[0] = preds[ci]
                    coef = np.zeros((8, 8))
                    coef[_ZZ_ROWS, _ZZ_COLS] = blk
                    coef *= qt
                    pix = _T.T @ coef @ _T + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample to full resolution by replication, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, dc_tree: dict, ac_tree: dict) -> np.ndarray:
    """One entropy-coded block → zigzag coefficient vector (DC is the
    DIFF, caller integrates the predictor)."""
    blk = np.zeros(64, dtype=np.int64)
    size = _decode_huffman(br, dc_tree)
    blk[0] = _extend(br.bits(size), size) if size else 0
    k = 1
    while k < 64:
        rs = _decode_huffman(br, ac_tree)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        blk[k] = _extend(br.bits(size), size)
        k += 1
    return blk
