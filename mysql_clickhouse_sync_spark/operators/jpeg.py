"""JPEG codec (baseline sequential + progressive): pure numpy +
stdlib, no binary deps.

The third real in-repo image codec (after uncompressed BMP and
zlib-compressed PNG) and the one real corpora are actually made of:
JPEG bytes dominate every web-scale image crawl, so a 100 TB media
pipeline's decode stage is overwhelmingly THIS format.  Where BMP
proved the registry seam and PNG proved it survives entropy coding,
JPEG proves it survives the full lossy-transform stack: entropy
decoding (canonical Huffman, byte unstuffing, restart markers) feeding
a transform decode (dequantize -> de-zigzag -> 8x8 IDCT) with
chroma upsampling and color conversion.

Scope (honest): baseline sequential DCT (SOF0 per the public ITU-T
T.81 spec + JFIF) AND progressive DCT (SOF2: multi-scan spectral
selection, DC/AC successive approximation, EOB-run AC coding —
T.81 Annex G, Huffman), 8-bit precision, 1 (grayscale) or 3 (YCbCr)
components, integer-ratio sampling factors (4:4:4, 4:2:0, 4:2:2 all
land here), restart intervals.  Arithmetic coding, 12-bit, and
hierarchical modes are rejected with the real cause — a deployment
that holds such files injects a libjpeg-backed codec via the same
MIME registry (``operators/codecs.py::register_image_codec``).

Layout implemented (the public interchange format): SOI; APP0 JFIF;
DQT (quant tables in zigzag order); SOF0 (geometry + per-component
sampling/quant refs); DHT (canonical Huffman: 16 length counts +
values, codes assigned per T.81 Annex C); optional DRI; SOS; entropy
data with 0xFF00 byte stuffing and RSTn markers; EOI.  Quality maps to
quant tables by the standard IJG rule (50 -> Annex K tables verbatim,
100 -> all-ones steps: the lossless-up-to-DCT-rounding setting the
exactness tests and the graded row build on).

Determinism contract (what the oracle grades): at quality 100 every
quantization step is 1, and an image that is CONSTANT within each
8x8 coding block round-trips BIT-EXACTLY — such a block's DCT is
DC-only (8 x (v - 128), an exact integer in float64; the AC terms are
~1e-13 cancellation noise that rounds to zero), survives step-1
quantization unchanged, and IDCTs back to the constant with ~1e-13
error, far under the final round-to-uint8 threshold.  Edge padding
REPLICATES the last row/column, so a partially-covered boundary block
of a per-8x8-tile mosaic stays constant too.  plans/media_queries.py
grades exactly this contract end-to-end.
"""

from __future__ import annotations

import struct

# -- spec constants ----------------------------------------------------


def _zigzag_order() -> list[int]:
    """Raster indices in zigzag scan order, generated from the walk
    rule (T.81 Figure 5) instead of a hand-typed table: diagonals of
    constant x+y, odd diagonals walked from the top row down, even
    diagonals bottom row up."""
    out = []
    for s in range(15):
        cells = [(y, s - y) for y in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            cells.reverse()
        out.extend(8 * y + x for y, x in cells)
    return out


ZIGZAG = _zigzag_order()

# Annex K quantization tables (quality-50 reference points).
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K canonical Huffman tables: (16 code-length counts, values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
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

# canonical-table sanity: length counts must cover the value list
for _b, _v in (
    (_DC_LUMA_BITS, _DC_LUMA_VALS),
    (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    (_AC_LUMA_BITS, _AC_LUMA_VALS),
    (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
):
    assert sum(_b) == len(_v), "corrupt built-in Huffman table"


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C canonical code assignment: symbol -> (code, length),
    codes increasing within a length, doubled at each length step."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 50 keeps the Annex K table, 100 collapses
    every step to 1 (the exactness setting), 1 is maximally coarse."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix M: FDCT is M @ block @ M.T, IDCT
    is M.T @ coeffs @ M (M is orthogonal)."""
    import numpy as np

    x = np.arange(8)
    u = np.arange(8)[:, None]
    M = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC difference / AC level per
    T.81 F.1.2: category = bit length of |v|; negative values send
    v + 2^cat - 1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v >= 0 else v + (1 << cat) - 1)


def _extend(bits: int, cat: int) -> int:
    """Inverse of :func:`_magnitude` (T.81 F.2.2.1 EXTEND)."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (an emitted
    0xFF is followed by 0x00 so it can never alias a marker)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: unstuffs
    0xFF00, stops AT (never consumes past) any real marker so the
    caller can handle RSTn / EOI."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ran out")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:                 # stuffed literal 0xFF
                self.pos += 2
            else:                           # a real marker: don't eat it
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        # Truncate consumed bits out of the accumulator: without this
        # acc grows into an unbounded bigint and every shift copies it,
        # making decode time quadratic in entropy-data size.
        self.acc &= (1 << self.n) - 1
        return bit

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        """Walk the canonical code bit by bit (codes are <= 16 bits)."""
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: unknown Huffman code")

    def sync_restart(self, expect: int) -> None:
        """Consume the byte-aligned RSTn marker between restart
        intervals; ``expect`` is the 0-7 modulo counter.  Scans
        forward to the next real marker first: the interval's final
        pad bits may live in a not-fully-consumed byte (possibly a
        stuffed 0xFF00) sitting between the reader position and the
        marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: missing restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"corrupt JPEG: expected RSTn, got 0xFF{m:02X}")
        if m - 0xD0 != expect:
            raise ValueError(
                f"corrupt JPEG: restart marker out of order "
                f"(got RST{m - 0xD0}, expected RST{expect})"
            )
        self.pos += 2


# -- encoder -----------------------------------------------------------


def _to_planes(arr, subsampling: str):
    """Input array -> list of (plane float64, h_factor, v_factor).
    Gray input stays one plane; RGB converts to JFIF YCbCr, with 4:2:0
    chroma produced by 2x2 box mean (the libjpeg default shape)."""
    import numpy as np

    if arr.ndim == 2:
        return [(arr.astype(np.float64), 1, 1)]
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsampling == "444":
        return [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
    # 4:2:0 — chroma halved both ways; odd edges replicate first
    def down(p):
        h, w = p.shape
        p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
        return 0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                       + p[0::2, 1::2] + p[1::2, 1::2])

    return [(y, 2, 2), (down(cb), 1, 1), (down(cr), 1, 1)]


def _pad_to_blocks(plane, bh: int, bw: int):
    """Edge-replicate a plane up to (bh*8, bw*8) — replication keeps a
    per-8x8-tile-constant mosaic constant in its boundary blocks,
    which the quality-100 exactness contract relies on."""
    import numpy as np

    h, w = plane.shape
    return np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )


def _validate_encode_input(arr, subsampling: str, name: str) -> None:
    """Shared input contract of both encoders — one copy, so a
    message or limit fix cannot silently drift between them."""
    import numpy as np

    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) or (
        arr.ndim == 3 and arr.shape[2] != 3
    ):
        raise ValueError(
            f"{name} needs an (h, w) or (h, w, 3) uint8 array, got "
            f"shape={arr.shape} dtype={arr.dtype}"
        )
    if arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError(
            f"{name} needs non-empty dimensions, got shape={arr.shape}"
        )
    if arr.shape[0] > 0xFFFF or arr.shape[1] > 0xFFFF:
        # JPEG's SOF geometry fields are 16-bit — check BEFORE paying
        # the whole DCT+entropy encode (struct.pack would otherwise
        # fail at the SOF write with an opaque struct.error)
        raise ValueError(
            f"{name}: dimensions exceed JPEG's 65535 limit, got "
            f"shape={arr.shape}"
        )
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got "
                         f"{subsampling!r}")


def _frame_headers(
    sof_marker: int, h: int, w: int, planes, qtables, gray: bool
) -> bytearray:
    """SOI + APP0 + DQT + SOF(0xC0 baseline / 0xC2 progressive) + DHT
    — the marker prefix shared verbatim by both encoders."""
    out = bytearray(b"\xff\xd8")                            # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"     # APP0
    for ti, q in enumerate(qtables):                         # DQT
        data = bytes([ti]) + bytes(q)                        # zigzag
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(data)) + data
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_p, hf, vf) in enumerate(planes):
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    huffs = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
             (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        huffs += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                  (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tc_th, bits, vals in huffs:                          # DHT
        data = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(data)) + data
    return out


def _quantized_blocks(arr, quality: int, subsampling: str):
    """Shared encode prep for the sequential AND progressive
    encoders: color planes, zigzag-order quant tables, and per-
    component quantized zigzag coefficient blocks over the padded MCU
    grid.  Returns ``(planes, qtables, comp_blocks, hmax, vmax,
    mcus_x, mcus_y)``."""
    import numpy as np

    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    planes = _to_planes(arr, subsampling)
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Quant tables are used AND stored (DQT segment, per spec) in
    # zigzag order: element k steps the k-th zigzag coefficient.
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)
    qtables = [[t[i] for i in ZIGZAG] for t in
               ([qluma] if gray else [qluma, qchroma])]
    M = _dct_matrix()

    # per component: quantized zigzag coefficient blocks in MCU order
    comp_blocks: list = []
    for ci, (plane, hf, vf) in enumerate(planes):
        q = np.array(qtables[0 if ci == 0 else 1], dtype=np.float64)
        padded = _pad_to_blocks(plane, mcus_y * vf, mcus_x * hf)
        ph, pw = padded.shape
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", M, blocks, M)
        zz = coeffs.reshape(-1, 64)[:, ZIGZAG]
        quant = np.round(zz / q[np.newaxis, :]).astype(np.int32)
        comp_blocks.append(quant.reshape(ph // 8, pw // 8, 64))
    return planes, qtables, comp_blocks, hmax, vmax, mcus_x, mcus_y


def encode_jpeg(
    img,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling`` is ``"444"`` (no chroma decimation; the exactness
    setting) or ``"420"`` (2x2 chroma decimation; the web default).
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs —
    the resync feature real encoders use so one bit error cannot
    corrupt the rest of the scan (and the path that makes the
    decoder's restart handling testable in-repo)."""
    import numpy as np

    arr = np.asarray(img)
    _validate_encode_input(arr, subsampling, "encode_jpeg")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"bad restart_interval: {restart_interval}")
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    (planes, qtables, comp_blocks, hmax, vmax, mcus_x, mcus_y) = (
        _quantized_blocks(arr, quality, subsampling)
    )

    dc_tabs = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    bw_ = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    mcu_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_interval == restart_interval:
                bw_.flush()
                bw_.buf.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
                mcu_in_interval = 0
            for ci, (_plane, hf, vf) in enumerate(planes):
                t = 0 if ci == 0 else 1
                for by in range(vf):
                    for bx in range(hf):
                        blk = comp_blocks[ci][my * vf + by, mx * hf + bx]
                        diff = int(blk[0]) - preds[ci]
                        preds[ci] = int(blk[0])
                        cat, extra = _magnitude(diff)
                        code, length = dc_tabs[t][cat]
                        bw_.write(code, length)
                        bw_.write(extra, cat)
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                zc, zl = ac_tabs[t][0xF0]   # ZRL
                                bw_.write(zc, zl)
                                run -= 16
                            cat, extra = _magnitude(v)
                            sc, sl = ac_tabs[t][(run << 4) | cat]
                            bw_.write(sc, sl)
                            bw_.write(extra, cat)
                            run = 0
                        if last_nz < 63:
                            ec, el = ac_tabs[t][0x00]       # EOB
                            bw_.write(ec, el)
            mcu_in_interval += 1
    bw_.flush()

    ncomp = 1 if gray else 3
    out = _frame_headers(0xC0, h, w, planes, qtables, gray)
    if restart_interval:                                     # DRI
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])                                     # SOS
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw_.buf
    out += b"\xff\xd9"                                       # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> PROGRESSIVE (SOF2)
    JFIF bytes.

    Scan script (spec-legal, the simple spectral-selection +
    one-step-DC-successive-approximation shape):

      1. DC scan, all components interleaved, Al=1 — codes the DC
         diffs of ``dc >> 1`` (arithmetic point transform);
      2. DC refinement scan (Ah=1, Al=0) — one raw bit per block
         appends the DC low bit;
      3. one full-band AC scan per component (Ss=1, Se=63, Al=0) in
         the component's own raster order, baseline-style run coding
         (an all-zero band emits EOB == an EOB run of 1).

    The quantized coefficients are IDENTICAL to :func:`encode_jpeg`'s
    at the same quality/subsampling — progressive only reorders the
    entropy layer — so a decode of this stream equals a decode of the
    baseline stream bit-for-bit (pinned in tests), and the quality-100
    per-8x8-block-constant exactness contract carries over unchanged.
    """
    import numpy as np

    arr = np.asarray(img)
    _validate_encode_input(arr, subsampling, "encode_jpeg_progressive")
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    (planes, qtables, comp_blocks, hmax, vmax, mcus_x, mcus_y) = (
        _quantized_blocks(arr, quality, subsampling)
    )
    ncomp = 1 if gray else 3
    dc_tabs = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))
    # non-interleaved per-component block grid for the AC scans
    nb = [
        ((-(-(h * vf) // vmax) + 7) // 8, (-(-(w * hf) // hmax) + 7) // 8)
        for _p, hf, vf in planes
    ]

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            td_ta = 0x00 if ci == 0 else 0x11
            sos += bytes([ci + 1, td_ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # scan 1: interleaved DC, Al=1 (diffs of dc >> 1)
    bw1 = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, hf, vf) in enumerate(planes):
                t = 0 if ci == 0 else 1
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(
                            comp_blocks[ci][my * vf + by, mx * hf + bx][0]
                        ) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        cat, extra = _magnitude(diff)
                        code, length = dc_tabs[t][cat]
                        bw1.write(code, length)
                        bw1.write(extra, cat)
    bw1.flush()

    # scan 2: DC refinement (Ah=1, Al=0): the low bit, raw
    bw2 = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, hf, vf) in enumerate(planes):
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(
                            comp_blocks[ci][my * vf + by, mx * hf + bx][0]
                        )
                        bw2.write(dc & 1, 1)
    bw2.flush()

    # scans 3..: per-component full-band AC (Ss=1, Se=63), the
    # component's own raster order over its UNPADDED block grid
    ac_scans = []
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        bwa = _BitWriter()
        bh, bw_n = nb[ci]
        for by in range(bh):
            for bx in range(bw_n):
                blk = comp_blocks[ci][by, bx]
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        zc, zl = ac_tabs[t][0xF0]           # ZRL
                        bwa.write(zc, zl)
                        run -= 16
                    cat, extra = _magnitude(v)
                    sc, sl = ac_tabs[t][(run << 4) | cat]
                    bwa.write(sc, sl)
                    bwa.write(extra, cat)
                    run = 0
                if last_nz < 63:
                    ec, el = ac_tabs[t][0x00]   # EOB (= EOB run of 1)
                    bwa.write(ec, el)
        bwa.flush()
        ac_scans.append(bwa.buf)

    out = _frame_headers(0xC2, h, w, planes, qtables, gray)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1) + bw1.buf
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0) + bw2.buf
    for ci in range(ncomp):
        out += sos_header([ci], 1, 63, 0, 0) + ac_scans[ci]
    out += b"\xff\xd9"                                       # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def decode_jpeg(payload: bytes):
    """JFIF bytes -> (h, w, 3) uint8 RGB array (grayscale replicates
    into all three channels).

    Accepts baseline sequential (SOF0) AND progressive (SOF2: multi-
    scan spectral selection + DC/AC successive approximation, EOB
    runs), 8-bit, 1 or 3 components, integer-ratio sampling factors,
    restart intervals.  Rejects arithmetic / 12-bit / hierarchical
    streams and malformed marker or entropy data with the real cause.
    """
    import numpy as np

    if payload is None or len(payload) < 4:
        raise ValueError("not a JPEG: payload shorter than SOI+EOI")
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: bad SOI magic {data[:2]!r}")

    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None            # (h, w, comps) from SOF0/SOF2
    scan = None             # per-component (td, ta) from SOS
    progressive = False
    dri = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(
                f"corrupt JPEG: expected a marker at byte {pos}"
            )
        marker = data[pos + 1]
        if marker == 0xFF:
            # optional fill byte before a marker (T.81 B.1.1.2) —
            # spec-legal padding real encoders emit; skip one at a time
            pos += 1
            continue
        if marker == 0xD9:
            # EOI before any SOS: stop walking — the check below
            # reports "missing SOF0/SOS" with the real cause
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone (length-less) markers: TEM, RSTn, stray SOI —
            # none is meaningful in the header section; skip
            pos += 2
            continue
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(
                f"unsupported JPEG variant: {_SOF_UNSUPPORTED[marker]} — "
                "baseline (SOF0) and progressive (SOF2) only; inject a "
                "libjpeg-backed codec via register_image_codec for such "
                "files"
            )
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) < seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                                  # DQT
            _parse_dqt_segment(seg, qtables)
        elif marker == 0xC4:                                # DHT
            _parse_dht_segment(seg, huff)
        elif marker in (0xC0, 0xC2):                        # SOF0/SOF2
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(
                    f"unsupported JPEG: {prec}-bit precision (8 only)"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG: {nc} components (1 or 3 only)"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:                                # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG segment: DRI")
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                                # SOS
            if progressive:
                if frame is None:
                    raise ValueError(
                        "corrupt JPEG: SOS before SOF2 frame header"
                    )
                # the multi-scan path owns the rest of the stream:
                # each SOS fills another (band, bit-plane) slice of
                # the persistent coefficient array, DHT/DQT/DRI may
                # appear between scans
                return _decode_progressive(
                    data, pos, frame, qtables, huff, dri
                )
            ns = seg[0]
            scan = {}
            for si in range(ns):
                cid, tdta = seg[1 + 2 * si : 3 + 2 * si]
                scan[cid] = (tdta >> 4, tdta & 0x0F)
            pos = pos + 2 + seglen
            break
        # APPn / COM / other non-structural segments: skipped
        pos = pos + 2 + seglen
    if frame is None or scan is None:
        raise ValueError("not a baseline JPEG: missing SOF0/SOS")
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise ValueError(
            "unsupported JPEG: multi-scan SEQUENTIAL stream (one "
            "interleaved scan only; multi-scan is the progressive "
            "SOF2 path)"
        )
    if set(scan) != {c[0] for c in comps}:
        # a bare KeyError from the MCU loop would escape the Arrow
        # decode stage without the real cause
        raise ValueError(
            f"corrupt JPEG: SOS component ids {sorted(scan)} do not "
            f"match SOF component ids {sorted(c[0] for c in comps)}"
        )
    hmax, vmax, mcus_x, mcus_y = _validate_frame_geometry(fh, fw, comps)

    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    # per component: int32 coefficient blocks (filled in MCU order)
    blocks = {
        cid: np.zeros((mcus_y * vf, mcus_x * hf, 64), dtype=np.int32)
        for cid, hf, vf, _tq in comps
    }
    mcu_count = 0
    rst_expect = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.sync_restart(rst_expect)
                rst_expect = (rst_expect + 1) % 8
                preds = {cid: 0 for cid, *_ in comps}
            for cid, hf, vf, _tq in comps:
                td, ta = scan[cid]
                dc_tab = huff.get((0, td))
                ac_tab = huff.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise ValueError(
                        f"corrupt JPEG: scan references missing Huffman "
                        f"table (dc={td}, ac={ta})"
                    )
                for by in range(vf):
                    for bx in range(hf):
                        blk = np.zeros(64, dtype=np.int32)
                        cat = reader.decode_symbol(dc_tab)
                        if cat > 11:
                            raise ValueError(
                                f"corrupt JPEG: DC category {cat}"
                            )
                        diff = _extend(reader.read_bits(cat), cat)
                        preds[cid] += diff
                        blk[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(ac_tab)
                            if sym == 0x00:                 # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"corrupt JPEG: bad AC symbol "
                                        f"0x{sym:02X}"
                                    )
                                k += 16                     # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC run past block end"
                                )
                            blk[k] = _extend(
                                reader.read_bits(size), size
                            )
                            k += 1
                        blocks[cid][my * vf + by, mx * hf + bx] = blk
            mcu_count += 1

    return _blocks_to_rgb(blocks, comps, fh, fw, qtables, hmax, vmax)


def _validate_frame_geometry(fh, fw, comps):
    """Shared SOF0/SOF2 geometry + sampling validation; returns
    (hmax, vmax, mcus_x, mcus_y)."""
    if fh == 0 or fw == 0:
        raise ValueError(f"bad JPEG geometry: w={fw} h={fh}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for cid, hf, vf, _tq in comps:
        if hf < 1 or vf < 1 or hmax % hf or vmax % vf:
            raise ValueError(
                f"unsupported JPEG: non-integer sampling ratio for "
                f"component {cid} (h={hf}, v={vf} vs max {hmax}x{vmax})"
            )
    return hmax, vmax, -(-fw // (8 * hmax)), -(-fh // (8 * vmax))


def _decode_progressive(data, pos, frame, qtables, huff, dri):
    """SOF2 multi-scan decode (T.81 Annex G, Huffman): every SOS
    fills another (spectral band, bit plane) slice of a persistent
    per-component coefficient array — DC scans are interleaved across
    components (or single-component raster for 1-component frames),
    AC scans are single-component by spec; successive-approximation
    first scans code values at ``<< Al``, refinement scans (Ah = Al+1)
    append one magnitude bit per coefficient; AC scans use EOB RUNS
    (symbol RRRR0 with RRRR < 15 = a run of 2^RRRR + extra
    end-of-band blocks).  DHT/DQT/DRI markers between scans take
    effect for subsequent scans.  After the last scan the accumulated
    coefficients run through the same dequant + IDCT + color path as
    the sequential decoder (:func:`_blocks_to_rgb`)."""
    import numpy as np

    fh, fw, comps = frame
    hmax, vmax, mcus_x, mcus_y = _validate_frame_geometry(fh, fw, comps)
    comp_by_id = {c[0]: c for c in comps}
    blocks = {
        cid: np.zeros((mcus_y * vf, mcus_x * hf, 64), dtype=np.int32)
        for cid, hf, vf, _tq in comps
    }
    # per-component NON-interleaved block grid (T.81 A.2.2: ceil of
    # the component's own scaled dimensions, NOT padded to MCUs)
    nb = {
        cid: (
            (-(-(fh * vf) // vmax) + 7) // 8,
            (-(-(fw * hf) // hmax) + 7) // 8,
        )
        for cid, hf, vf, _tq in comps
    }
    # per-component first-scan coverage (T.81 G.1.1.1.1 scan-script
    # ordering): coefficient k of component cid may only be REFINED
    # (Ah > 0) after its Ah=0 first scan, and AC scans may only follow
    # the component's first DC scan — an out-of-order script would
    # otherwise decode silently against zeroed coefficients, yielding
    # wrong pixels instead of the real-cause error this module
    # promises for malformed streams
    first_done = {cid: bytearray(64) for cid, _hf, _vf, _tq in comps}
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(
                f"corrupt JPEG: expected a marker at byte {pos}"
            )
        marker = data[pos + 1]
        if marker == 0xFF:                      # fill byte
            pos += 1
            continue
        if marker == 0xD9:                      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: segment header ran out")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) < seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xC4:                      # DHT between scans
            _parse_dht_segment(seg, huff)
        elif marker == 0xDB:                    # DQT between scans
            _parse_dqt_segment(seg, qtables)
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError("truncated JPEG segment: DRI")
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # next scan
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG segment: SOS")
            scan_comps = []
            for si in range(ns):
                cid, tdta = seg[1 + 2 * si : 3 + 2 * si]
                if cid not in comp_by_id:
                    raise ValueError(
                        f"corrupt JPEG: SOS component id {cid} not in "
                        f"SOF2 frame"
                    )
                scan_comps.append((cid, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _progressive_scan(
                data, pos + 2 + seglen, blocks, nb, comp_by_id,
                scan_comps, ss, se, ah, al, huff, dri,
                mcus_x, mcus_y, first_done,
            )
            saw_scan = True
            continue
        pos = pos + 2 + seglen
    if not saw_scan:
        raise ValueError("not a progressive JPEG: SOF2 without any SOS")
    return _blocks_to_rgb(blocks, comps, fh, fw, qtables, hmax, vmax)


def _progressive_scan(
    data, pos, blocks, nb, comp_by_id, scan_comps, ss, se, ah, al,
    huff, dri, mcus_x, mcus_y, first_done,
):
    """Entropy-decode ONE progressive scan into ``blocks`` in place;
    returns the byte position of the marker that ended the scan.
    ``first_done`` tracks per-component Ah=0 coverage per coefficient
    so out-of-order scan scripts fail with the real cause."""
    if ss > se or se > 63:
        raise ValueError(f"corrupt JPEG: bad spectral band {ss}..{se}")
    if (ss == 0) != (se == 0):
        raise ValueError(
            "corrupt JPEG: DC and AC coefficients in one progressive "
            f"scan (band {ss}..{se})"
        )
    if ah not in (0, al + 1):
        raise ValueError(
            f"corrupt JPEG: successive approximation Ah={ah} with "
            f"Al={al} (refinement must step one bit)"
        )
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError(
            "corrupt JPEG: progressive AC scans must be "
            "single-component"
        )
    for cid, _td, _ta in scan_comps:
        cov = first_done[cid]
        if ss > 0 and not cov[0]:
            raise ValueError(
                f"corrupt JPEG: AC scan before the first DC scan "
                f"(component {cid})"
            )
        if ah > 0 and any(not cov[k] for k in range(ss, se + 1)):
            raise ValueError(
                f"corrupt JPEG: refinement scan before first scan "
                f"(component {cid}, band {ss}..{se})"
            )
        if ah == 0:
            for k in range(ss, se + 1):
                cov[k] = 1
    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, _td, _ta in scan_comps}
    state = {"eobrun": 0}
    rst_expect = 0
    units = 0

    def maybe_restart():
        nonlocal rst_expect
        reader.sync_restart(rst_expect)
        rst_expect = (rst_expect + 1) % 8
        for c in preds:
            preds[c] = 0
        state["eobrun"] = 0

    def dc_table(td):
        t = huff.get((0, td))
        if t is None:
            raise ValueError(
                f"corrupt JPEG: scan references missing DC table {td}"
            )
        return t

    def ac_table(ta):
        t = huff.get((1, ta))
        if t is None:
            raise ValueError(
                f"corrupt JPEG: scan references missing AC table {ta}"
            )
        return t

    if ss == 0 and len(scan_comps) > 1:
        # interleaved DC scan: MCU order over the padded grid
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and units and units % dri == 0:
                    maybe_restart()
                for cid, td, _ta in scan_comps:
                    _c, hf, vf, _tq = comp_by_id[cid]
                    for by in range(vf):
                        for bx in range(hf):
                            blk = blocks[cid][my * vf + by, mx * hf + bx]
                            _prog_dc(
                                reader, blk, preds, cid, ah, al,
                                dc_table(td) if ah == 0 else None,
                            )
                units += 1
    else:
        # single-component scan (DC for 1-comp frames, or any AC
        # band): the component's OWN raster block order
        cid, td, ta = scan_comps[0]
        bh, bw_n = nb[cid]
        tab = (
            dc_table(td) if ss == 0 and ah == 0
            else ac_table(ta) if ss > 0
            else None
        )
        for by in range(bh):
            for bx in range(bw_n):
                if dri and units and units % dri == 0:
                    maybe_restart()
                blk = blocks[cid][by, bx]
                if ss == 0:
                    _prog_dc(reader, blk, preds, cid, ah, al, tab)
                elif ah == 0:
                    _prog_ac_first(reader, blk, ss, se, al, tab, state)
                else:
                    _prog_ac_refine(reader, blk, ss, se, al, tab, state)
                units += 1
    # scan ends at the next marker: scrub forward over any pad bits
    reader.acc = 0
    reader.n = 0
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00
    ):
        p += 1
    return p


def _prog_dc(reader, blk, preds, cid, ah, al, dc_tab):
    if ah == 0:                                 # first DC scan
        cat = reader.decode_symbol(dc_tab)
        if cat > 11:
            raise ValueError(f"corrupt JPEG: DC category {cat}")
        preds[cid] += _extend(reader.read_bits(cat), cat)
        blk[0] = preds[cid] << al
    else:                                       # DC refinement: 1 bit
        if reader.read_bit():
            blk[0] |= 1 << al


def _prog_ac_first(reader, blk, ss, se, al, ac_tab, state):
    if state["eobrun"] > 0:                     # inside an EOB run
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = reader.decode_symbol(ac_tab)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:                       # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << run) - 1    # EOBn: this block +
            if run:                             # eobrun more
                state["eobrun"] += reader.read_bits(run)
            break
        k += run
        if k > se:
            raise ValueError("corrupt JPEG: AC run past band end")
        blk[k] = _extend(reader.read_bits(size), size) << al
        k += 1


def _prog_ac_refine(reader, blk, ss, se, al, ac_tab, state):
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    nonzero coefficients arrive as +-1 << Al; every already-nonzero
    coefficient traversed receives one CORRECTION bit."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k):
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = reader.decode_symbol(ac_tab)
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    state["eobrun"] = 1 << run
                    if run:
                        state["eobrun"] += reader.read_bits(run)
                    break
                val = 0                          # ZRL: skip 16 zeros
            else:
                if size != 1:
                    raise ValueError(
                        "corrupt JPEG: AC refinement magnitude "
                        f"category {size} (must be 1)"
                    )
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val != 0:
                # same corrupt-input contract as _prog_ac_first: a
                # decoded nonzero whose zero-run overran the band end
                # must error, not silently drop the coefficient
                if k > se:
                    raise ValueError("corrupt JPEG: AC run past band end")
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:                           # EOB run: corrections
            if blk[k] != 0:                      # only, no insertions
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _parse_dht_segment(seg, huff):
    p = 0
    while p < len(seg):
        tc, th = seg[p] >> 4, seg[p] & 0x0F
        if p + 17 > len(seg):
            raise ValueError("truncated JPEG segment: DHT")
        bits = list(seg[p + 1 : p + 17])
        nvals = sum(bits)
        if p + 17 + nvals > len(seg):
            raise ValueError("truncated JPEG segment: DHT")
        vals = list(seg[p + 17 : p + 17 + nvals])
        codes = _build_codes(bits, vals)
        huff[(tc, th)] = {
            (length, code): sym for sym, (code, length) in codes.items()
        }
        p += 17 + nvals


def _parse_dqt_segment(seg, qtables):
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0x0F
        if pq != 0:
            raise ValueError(
                "unsupported JPEG: 16-bit quant table (12-bit "
                "precision stream)"
            )
        if p + 65 > len(seg):
            raise ValueError("truncated JPEG segment: DQT")
        qtables[tq] = list(seg[p + 1 : p + 65])
        p += 65


def _blocks_to_rgb(blocks, comps, fh, fw, qtables, hmax, vmax):
    """Quantized zigzag coefficient blocks -> (h, w, 3) uint8 RGB:
    dequantize + de-zigzag + batch IDCT per component, upsample,
    color-convert.  Shared by the sequential (one-scan) and
    progressive (multi-scan accumulated) decode paths."""
    import numpy as np

    M = _dct_matrix()
    inv_zz = np.argsort(np.array(ZIGZAG))
    planes = {}
    for cid, hf, vf, tq in comps:
        if tq not in qtables:
            raise ValueError(
                f"corrupt JPEG: component {cid} references missing "
                f"quant table {tq}"
            )
        q = np.array(qtables[tq], dtype=np.float64)
        bh, bw_n = blocks[cid].shape[:2]
        zz = blocks[cid].reshape(-1, 64).astype(np.float64) * q
        coeffs = zz[:, inv_zz].reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", M, coeffs, M) + 128.0
        plane = (
            pix.reshape(bh, bw_n, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_n * 8)
        )
        # upsample to full geometry, then crop
        plane = np.repeat(np.repeat(plane, vmax // vf, axis=0),
                          hmax // hf, axis=1)
        planes[cid] = plane[:fh, :fw]

    if len(comps) == 1:
        y = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.stack([y, y, y], axis=-1))
    (yid, *_), (cbid, *_), (crid, *_) = comps
    y = planes[yid]
    cb = planes[cbid] - 128.0
    cr = planes[crid] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.ascontiguousarray(
        np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    )


class JpegImageCodec:
    """In-repo JPEG codec (baseline + progressive decode, baseline
    encode): stdlib struct + numpy (DCT via an orthonormal matrix
    product, canonical Huffman per T.81 Annex C, SOF2 multi-scan per
    Annex G).  The dependency-free fallback — a deployment with
    libjpeg-turbo injects it over this MIME type for decode
    throughput."""

    def decode(self, payload: bytes):
        return decode_jpeg(payload)

    def encode(self, rgb, quality: int = 85) -> bytes:
        return encode_jpeg(rgb, quality=quality)
