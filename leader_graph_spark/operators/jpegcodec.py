"""Hermetic baseline JPEG codec (encode + decode), stdlib + numpy.

Same role as ``pngcodec.py``: the multimodal lane's REAL pixel path in
environments without PIL. Implements the public ITU-T T.81 baseline
sequential process — quality-scaled Annex-K quantization tables,
Annex-K Huffman tables, 8x8 DCT type-II/III via an orthonormal matrix,
JFIF YCbCr color transform — nothing more:

- encode: 8-bit RGB or grayscale, 4:4:4 (no subsampling), interleaved
  single scan, quality 1-100 (IJG scaling curve);
- decode: baseline DCT (SOF0/SOF1), 1 or 3 components, sampling
  factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, byte
  unstuffing; progressive (SOF2) and arithmetic coding are rejected
  with a clear error.

The decoder builds its Huffman tables from the stream's DHT segments,
so an encode→decode round-trip validates the emitted bitstream against
an independent reading of the spec tables, not against shared code.

Throughput note: the per-coefficient Huffman loops are pure Python —
fine for the fixture-sized images the tests and the resize lane touch
here. Deployments with Pillow installed take the PIL path in
``multimodal.py``; this codec is the hermetic fallback, prioritized
for correctness and zero dependencies over speed.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (ITU-T T.81, public spec) ------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
    0xF9, 0xFA,
]

JPEG_MAGIC = b"\xff\xd8"

# Orthonormal 8x8 DCT-II matrix: FDCT = M @ X @ M.T, IDCT = M.T @ C @ M.
_DCT_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_M[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- bit I/O ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Reads entropy-coded bits with byte unstuffing; surfaces restart
    markers to the MCU loop."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.pending_marker: int | None = None

    def _next_byte(self) -> int:
        while True:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF")
            m = self.data[self.pos]
            self.pos += 1
            if m == 0x00:
                return 0xFF
            self.pending_marker = m
            raise _MarkerHit(m)

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._acc = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self._nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received magnitude bits to signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[idx]
                idx += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


class _HuffEncoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.table: dict[int, tuple[int, int]] = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.table[vals[idx]] = (code, length)
                idx += 1
                code += 1
            code <<= 1

    def write(self, bw: _BitWriter, sym: int) -> None:
        code, length = self.table[sym]
        bw.write(code, length)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) for a signed coefficient per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# --- encoder ---------------------------------------------------------------


def encode_jpeg(
    width: int, height: int, pixels: bytes, *, channels: int = 3, quality: int = 85
) -> bytes:
    """Baseline JFIF encode of row-major 8-bit pixels (RGB or gray),
    4:4:4, single interleaved scan, Annex-K Huffman tables."""
    if channels not in (1, 3):
        raise ValueError("jpeg encode: channels must be 1 (gray) or 3 (rgb)")
    if len(pixels) != width * height * channels:
        raise ValueError("jpeg encode: pixel buffer size mismatch")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[:, :, 0].astype(np.float64)]

    qluma = _scaled_quant(QUANT_LUMA, quality)
    qchroma = _scaled_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] + ([qchroma] if channels == 3 else [])

    out = bytearray()
    out += JPEG_MAGIC
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT segments
    for tid, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(q[z]) for z in ZIGZAG)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * channels, 8, height, width, channels)
    for ci in range(channels):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT segments
    huff_specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if channels == 3:
        huff_specs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_enc = [_HuffEncoder(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_enc = [_HuffEncoder(AC_LUMA_BITS, AC_LUMA_VALS)]
    if channels == 3:
        dc_enc += [_HuffEncoder(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_enc += [_HuffEncoder(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2
        qsel = [qluma, qchroma, qchroma]
    else:
        qsel = [qluma]

    bw = _BitWriter()
    pred = [0] * channels
    bh = (height + 7) // 8
    bwidth = (width + 7) // 8
    # edge-replicated padding to full blocks
    padded = [
        np.pad(p, ((0, bh * 8 - height), (0, bwidth * 8 - width)), mode="edge")
        for p in planes
    ]
    for by in range(bh):
        for bx in range(bwidth):
            for ci in range(channels):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                quant = np.round(coef.flatten()[ZIGZAG] / qsel[ci].astype(np.float64)[ZIGZAG]).astype(int)
                # DC
                diff = int(quant[0]) - pred[ci]
                pred[ci] = int(quant[0])
                size, bits = _magnitude(diff)
                dc_enc[ci].write(bw, size)
                if size:
                    bw.write(bits, size)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(quant[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_enc[ci].write(bw, 0xF0)  # ZRL
                        run -= 16
                    size, bits = _magnitude(v)
                    ac_enc[ci].write(bw, (run << 4) | size)
                    bw.write(bits, size)
                    run = 0
                if run:
                    ac_enc[ci].write(bw, 0x00)  # EOB
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline decode → (width, height, channels, row-major pixels).
    3-component streams return RGB; 1-component return grayscale."""
    if payload[:2] != JPEG_MAGIC:
        raise ValueError("jpeg: bad signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0

    def seglen() -> int:
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated segment length")
        return struct.unpack(">H", payload[pos : pos + 2])[0]

    # Header parsing is fully bounds-checked: any truncation or
    # malformed segment raises the codec's clean ValueError, never
    # IndexError/struct.error (round-10 truncation-sweep hardening).
    scan_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        if pos + 1 >= len(payload):
            raise ValueError("jpeg: truncated in headers")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        ln = seglen()
        body = payload[pos + 2 : pos + ln]
        try:
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    prec_id = body[i]
                    tid, prec = prec_id & 0x0F, prec_id >> 4
                    n = 64 * (2 if prec else 1)
                    raw = body[i + 1 : i + 1 + n]
                    if len(raw) < n:
                        raise ValueError("jpeg: truncated DQT")
                    vals = (
                        np.frombuffer(raw, dtype=">u2").astype(np.int32)
                        if prec
                        else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                    )
                    tab = np.zeros(64, dtype=np.int32)
                    tab[ZIGZAG] = vals
                    qtables[tid] = tab
                    i += 1 + n
            elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
                _, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                comps = []
                for ci in range(ncomp):
                    cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
                if ncomp not in (1, 3):
                    raise ValueError(f"jpeg: {ncomp} components unsupported")
                for c in comps:
                    if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                        raise ValueError("jpeg: sampling factors above 2 unsupported")
            elif marker == 0xC2:
                raise ValueError("jpeg: progressive (SOF2) unsupported; baseline only")
            elif marker in (0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC), *range(0xCD, 0xD0)):
                raise ValueError(f"jpeg: SOF marker 0x{marker:02x} unsupported")
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(body):
                    tc_th = body[i]
                    bits = list(body[i + 1 : i + 17])
                    if len(bits) < 16:
                        raise ValueError("jpeg: truncated DHT")
                    nvals = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nvals])
                    if len(vals) < nvals:
                        raise ValueError("jpeg: truncated DHT")
                    dec = _HuffDecoder(bits, vals)
                    if tc_th >> 4 == 0:
                        huff_dc[tc_th & 0x0F] = dec
                    else:
                        huff_ac[tc_th & 0x0F] = dec
                    i += 17 + nvals
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan_sel = {}
                for si in range(ns):
                    cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                    scan_sel[cs] = (tdta >> 4, tdta & 0x0F)
                scan_start = pos + ln
        except (IndexError, struct.error) as exc:
            # short body / truncated field inside a header segment:
            # surface the codec's clean error contract
            raise ValueError(
                f"jpeg: truncated or malformed segment 0x{marker:02x}"
            ) from exc
        if scan_start is not None:
            return _decode_scan(
                payload, scan_start, width, height, comps, scan_sel,
                qtables, huff_dc, huff_ac, restart_interval,
            )
        pos += ln
    raise ValueError("jpeg: no SOS scan found")


def _decode_scan(
    data, pos, width, height, comps, scan_sel, qtables, huff_dc, huff_ac, restart_interval
):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64) for c in comps
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    total_mcus = mcux * mcuy
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.align()
                    # the marker byte pair was seen by the reader; the
                    # pending RSTn resets DC prediction
                    if br.pending_marker is None:
                        # consume the RST marker directly from the
                        # stream, bounds-checked: truncation exactly at
                        # a restart boundary must raise the codec's
                        # clean ValueError, never IndexError. Skips
                        # 0xFF fill bytes and (non-conformant) stuffed
                        # FF 00 padding before the marker.
                        p = br.pos
                        while (
                            p + 1 < len(data)
                            and data[p] == 0xFF
                            and data[p + 1] in (0xFF, 0x00)
                        ):
                            p += 2 if data[p + 1] == 0x00 else 1
                        if p + 1 >= len(data):
                            raise ValueError("jpeg: truncated at restart marker")
                        if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                            br.pos = p + 2
                        else:
                            br.pos = p
                    br.pending_marker = None
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, c in enumerate(comps):
                    td, ta = scan_sel[c["id"]]
                    q = qtables[c["tq"]].astype(np.float64)
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.float64)
                            size = huff_dc[td].decode(br)
                            diff = _extend(br.receive(size), size) if size else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = huff_ac[ta].decode(br)
                                run, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if run == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    raise ValueError("jpeg: AC index overflow")
                                zz[k] = _extend(br.receive(size), size)
                                k += 1
                            coef = np.zeros(64, dtype=np.float64)
                            coef[ZIGZAG] = zz * q[ZIGZAG]
                            block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    except _MarkerHit as hit:
        if not (0xD0 <= hit.marker <= 0xD7 or hit.marker == 0xD9):
            raise ValueError(f"jpeg: unexpected marker 0x{hit.marker:02x} in scan") from None
        # EOI/RST at the tail of a fully-decoded image is fine; anything
        # earlier means truncation
        if mcu_count < total_mcus:
            raise ValueError("jpeg: scan ended before all MCUs decoded") from None

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, gray.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
