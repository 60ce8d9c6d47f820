"""Baseline JPEG codec tests.

The decoder is pinned against HAND-ASSEMBLED golden bytes with
hand-built minimal Huffman tables (not the module's Annex K constants
and not a round-trip through our own encoder), so an encoder/decoder
pair sharing a mirror-image bug — wrong zigzag order, wrong DC
prediction, wrong EXTEND — cannot pass.  Lossy paths are bounded by
error tolerances; the quality-100 flat-per-block path is asserted
BIT-EXACT (the contract the graded registry row builds on).
"""

from __future__ import annotations

import numpy as np
import pytest

from mysql_clickhouse_sync_spark.operators.codecs import image_codec_for
from mysql_clickhouse_sync_spark.operators.jpeg import (
    ZIGZAG,
    JpegImageCodec,
    decode_jpeg,
    encode_jpeg,
)


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data


def _golden_flat_gray() -> bytes:
    """Hand-assembled minimal 8x8 grayscale JPEG, flat value 130.

    Quant table: all ones.  Custom 1-entry Huffman tables: DC category
    5 has code '0' (1 bit); AC EOB has code '0'.  DC coefficient of a
    flat 130 block is 8 x (130 - 128) = 16 -> category 5, extra bits
    '10000'.  Entropy stream: 0 10000 0 = 7 bits, padded with one
    1-bit -> 0b01000001 = 0x41.
    """
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dc_bits = [1] + [0] * 15           # one 1-bit code
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([5])   # cat 5 -> '0'
    dht_ac = bytes([0x10]) + bytes(dc_bits) + bytes([0x00])  # EOB -> '0'
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0x41])
        + b"\xff\xd9"
    )


def test_decode_golden_flat_gray():
    out = decode_jpeg(_golden_flat_gray())
    assert out.shape == (8, 8, 3)
    assert (out == 130).all()


def test_decode_golden_single_ac_coefficient():
    """A DC-zero block with ONE AC coefficient pins zigzag position,
    dequantization and the IDCT basis independently of the encoder:
    zigzag index 1 is raster (u, v) = (0, 1), so the decoded block
    must equal round(128 + c * basis_01), computed here from the
    spec's cosine formula directly."""
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    # DC table: cat 0 -> '0'.  AC table: symbol 0x03 (run 0, size 3)
    # -> '0', EOB -> '10'.
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0])
    dht_ac = bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([0x03, 0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC '0', AC symbol '0', extra bits '101' (=5), EOB '10'
    # -> 0 0 101 10 = 7 bits, pad '1' -> 0b00101101 = 0x2D
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0x2D])
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    x = np.arange(8)
    # pixel = M[0,x] * c * M[1,y]: (1/(2*sqrt(2))) * (1/2) * cos(...)
    basis = 0.25 * (1 / np.sqrt(2)) * np.cos((2 * x + 1) * 1 * np.pi / 16)
    expected = np.clip(np.round(128.0 + 5.0 * basis), 0, 255).astype(np.uint8)
    # the (0, 1) basis varies along x (columns), constant down rows
    assert (out[:, :, 0] == expected[np.newaxis, :]).all()


def test_negative_ac_extend():
    """Same stream but extra bits '010' (category 3) must EXTEND to
    -5 per T.81 F.2.2.1 — the sign path a round trip can mask."""
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0])
    dht_ac = bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([0x03, 0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # DC '0', AC '0', extra '010' (-5), EOB '10' -> 0 0 010 10 + pad
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0b00010101])
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    x = np.arange(8)
    # pixel = M[0,x] * c * M[1,y]: (1/(2*sqrt(2))) * (1/2) * cos(...)
    basis = 0.25 * (1 / np.sqrt(2)) * np.cos((2 * x + 1) * 1 * np.pi / 16)
    expected = np.clip(np.round(128.0 - 5.0 * basis), 0, 255).astype(np.uint8)
    assert (out[:, :, 0] == expected[np.newaxis, :]).all()


def test_zigzag_is_the_spec_table():
    """The generated walk must equal the spec's table (spot-pinned by
    its well-known prefix and involution properties)."""
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18,
                           11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[63] == 63


def test_quality_100_per_block_mosaic_is_exact():
    """The graded-row contract: flat-per-8x8-block gray mosaics
    round-trip bit-exactly at quality 100 (DC-only blocks, step-1
    quantization), including non-multiple-of-8 geometry whose edge
    padding replicates into the boundary blocks."""
    for did in (0, 3, 42, 255, 1000):
        w, h = 10 + did % 7, 9 + did % 5
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        g = ((did + 37 * (xx // 8) + 101 * (yy // 8)) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=100))
        assert out.shape == (h, w, 3)
        for ch in range(3):
            assert np.array_equal(out[:, :, ch], g), (did, ch)


def test_gray_quality_100_arbitrary_content_off_by_one():
    """Arbitrary content at quality 100 is NOT exact (DCT coefficient
    rounding) but must stay within 1 level — the documented
    lossless-up-to-DCT-rounding bound."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 1


def test_rgb_444_round_trip_tolerance():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    # random noise is JPEG's worst case; q95 keeps it bounded
    assert err.max() <= 48 and err.mean() <= 8.0


def test_rgb_420_smooth_round_trip():
    """Chroma-subsampled path on a smooth gradient (the content 4:2:0
    is designed for) — exercises the decoder's 2x upsampling."""
    x = np.linspace(0, 255, 40)
    img = np.stack(
        [
            np.tile(x, (30, 1)),
            np.tile(x[::-1], (30, 1)),
            np.full((30, 40), 100.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() <= 4.0


def test_restart_intervals_round_trip():
    """DRI/RSTn path: restart markers + DC-predictor resets must not
    change the decoded result vs the marker-free stream."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(33, 50), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=100))
    for interval in (1, 3, 7):
        with_rst = decode_jpeg(
            encode_jpeg(img, quality=100, restart_interval=interval)
        )
        assert np.array_equal(with_rst, base), interval


def test_byte_stuffing_survives():
    """An all-255 image maximizes 0xFF-heavy entropy bytes; the
    stuffed stream must still round-trip (and flat 255 at q100 is
    exact by the mosaic contract)."""
    img = np.full((8, 8), 255, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert (out == 255).all()


def test_progressive_malformed_scans_rejected_with_real_cause():
    """SOF2 is now SUPPORTED; what must still fail is a structurally
    invalid progressive stream: a scan mixing DC and AC coefficients
    (the old baseline golden relabeled SOF2 has Ss=0, Se=63), an AC
    scan claiming multiple components, a refinement step of more than
    one bit, and a frame with no scan at all."""
    golden = bytearray(_golden_flat_gray())
    idx = golden.index(b"\xff\xc0")
    golden[idx + 1] = 0xC2                     # now a hybrid scan
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(golden))

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof2 = (bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    base = b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2)
    with pytest.raises(ValueError, match="missing SOF0/SOS"):
        decode_jpeg(base + b"\xff\xd9")     # SOF2 with no scan at all
    dc_bits = [1] + [0] * 15
    dht = bytes([0x00]) + bytes(dc_bits) + bytes([0])
    bad_ahal = base + _seg(0xC4, dht) + _seg(
        0xDA, bytes([1, 1, 0x00, 0, 0, 0x20])   # Ah=2, Al=0
    ) + bytes([0x7F]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="refinement must step one"):
        decode_jpeg(bad_ahal)


def test_twelve_bit_quant_rejected():
    golden = bytearray(_golden_flat_gray())
    idx = golden.index(b"\xff\xdb")
    golden[idx + 4] = 0x10          # Pq=1: 16-bit table
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(bytes(golden))


def test_truncated_dqt_dht_report_real_cause():
    """A DQT whose payload is shorter than the 65 bytes a table needs
    (and a DHT whose bits-counts promise more vals than the segment
    carries) must fail with 'truncated JPEG segment', not die later in
    numpy broadcasting / a silently short Huffman vals list."""
    short_dqt = bytes([0x00]) + bytes([1] * 32)       # 33 < 65 bytes
    with pytest.raises(ValueError, match="truncated JPEG segment: DQT"):
        decode_jpeg(b"\xff\xd8" + _seg(0xDB, short_dqt) + b"\xff\xd9")
    bits = [0] * 16
    bits[0] = 3                                       # promises 3 vals
    short_dht = bytes([0x00]) + bytes(bits) + bytes([5])  # carries 1
    with pytest.raises(ValueError, match="truncated JPEG segment: DHT"):
        decode_jpeg(b"\xff\xd8" + _seg(0xC4, short_dht) + b"\xff\xd9")


def test_bitreader_accumulator_stays_bounded():
    """The bit reader must truncate consumed bits out of its
    accumulator: without the mask, acc grows into an unbounded bigint
    and every shift copies it, making decode time QUADRATIC in
    entropy-data size (measured: 4x data -> ~12x time before the
    fix).  Read a long all-ones stream and pin acc <= n bits
    throughout."""
    from mysql_clickhouse_sync_spark.operators.jpeg import _BitReader

    reader = _BitReader(b"\xfe" * 4096, 0)
    for _ in range(4096 * 8):
        reader.read_bit()
        assert reader.acc.bit_length() <= reader.n


def test_bad_magic_and_truncation_rejected():
    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x00\x01\x02\x03\x04")
    with pytest.raises(ValueError, match="shorter"):
        decode_jpeg(b"\xff\xd8")
    good = _golden_flat_gray()
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 4])   # entropy data cut short


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(ValueError, match="non-empty"):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), subsampling="422")
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8), quality=0)
    # SOF geometry fields are 16-bit: reject UPFRONT, not after paying
    # the whole DCT+entropy encode for a struct.error at the SOF write
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(np.zeros((70000, 1), dtype=np.uint8))


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; real encoders emit them and the decoder must skip them
    (previously misparsed as a truncated segment)."""
    golden = _golden_flat_gray()
    # inject fill bytes after SOI, before the DQT marker
    padded = golden[:2] + b"\xff\xff" + golden[2:]
    out = decode_jpeg(padded)
    assert (out == 130).all()


def test_sos_sof_component_mismatch_rejected_with_real_cause():
    """SOS naming a component id the SOF never declared must raise a
    ValueError naming both id sets, not a bare KeyError from the MCU
    loop (which would escape the Arrow decode stage uncaught)."""
    golden = bytearray(_golden_flat_gray())
    idx = golden.index(b"\xff\xda")
    assert golden[idx + 5] == 1          # SOS component id byte
    golden[idx + 5] = 9
    with pytest.raises(ValueError, match="SOS component ids"):
        decode_jpeg(bytes(golden))


def test_premature_eoi_reports_missing_scan():
    payload = b"\xff\xd8\xff\xd9"
    with pytest.raises(ValueError, match="missing SOF0/SOS"):
        decode_jpeg(payload)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(50, 100),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420"]),
    rst=st.sampled_from([0, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_error_bound_property(h, w, quality, gray, sub, rst, seed):
    """Property fuzz over geometry x quality x mode x subsampling x
    restart interval against a QUANTIZATION-THEORY error bound, not a
    guessed tolerance: flat-per-16x16-tile mosaics make every coding
    block flat in BOTH luma and (420-subsampled) chroma, so the only
    loss is DC rounding — at most quant_step/2 per coefficient, i.e.
    step/16 per pixel per plane, propagated through the YCbCr->RGB
    coefficients (|1.772| worst) plus conversion/rounding slack.  A
    broken block order, EXTEND, zigzag, upsample or plane swap blows
    this bound by an order of magnitude on multi-tile images.

    (Random-noise content is deliberately NOT asserted against a
    tolerance: at q=60, chroma steps ~79 and 4:2:0 averaging make
    per-pixel errors >100 CORRECT behavior — any bound would be
    either vacuous or wrong.)"""
    from mysql_clickhouse_sync_spark.operators.jpeg import (
        _QUANT_CHROMA,
        _QUANT_LUMA,
        _scaled_quant,
    )

    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = tiles[np.minimum(yy // 16, 2), np.minimum(xx // 16, 2)]
    if gray:
        img = img[:, :, 0].copy()
    out = decode_jpeg(
        encode_jpeg(img, quality=quality, subsampling=sub,
                    restart_interval=rst)
    )
    assert out.shape == (h, w, 3)
    ref = img if not gray else np.stack([img] * 3, axis=-1)
    err = np.abs(out.astype(int) - ref.astype(int))
    s_y = _scaled_quant(_QUANT_LUMA, quality)[0] / 16.0
    s_c = _scaled_quant(_QUANT_CHROMA, quality)[0] / 16.0
    bound = s_y + (0.0 if gray else 1.772 * s_c) + 2.0
    assert err.max() <= bound, (err.max(), bound, quality, sub)


def test_registered_in_image_registry():
    codec = image_codec_for("image/jpeg")
    assert isinstance(codec, JpegImageCodec)
    img = np.full((9, 11), 77, dtype=np.uint8)
    assert (codec.decode(codec.encode(img, quality=100)) == 77).all()


# ------------------------------------------------------- progressive


def test_progressive_equals_baseline_decode():
    """Progressive (SOF2) only reorders the ENTROPY layer — the
    quantized coefficients are identical — so decoding the
    progressive stream must equal decoding the baseline stream
    BIT-FOR-BIT at every quality/geometry/color/subsampling tried."""
    from mysql_clickhouse_sync_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    for _ in range(6):
        h, w = rng.randint(4, 40), rng.randint(4, 40)
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        q = int(rng.choice([50, 85, 100]))
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img, quality=q)),
            decode_jpeg(encode_jpeg(img, quality=q)),
        )
    rgb = rng.randint(0, 256, (21, 17, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(rgb, quality=85)),
        decode_jpeg(encode_jpeg(rgb, quality=85)),
    )
    sub = rng.randint(0, 256, (33, 29, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(
            encode_jpeg_progressive(sub, quality=85, subsampling="420")
        ),
        decode_jpeg(encode_jpeg(sub, quality=85, subsampling="420")),
    )


def test_progressive_quality_100_mosaic_is_exact():
    """The media_decode_jpeg exactness contract carries over: quality
    100 per-8x8-block-constant mosaics round-trip BIT-EXACTLY through
    the progressive scan script (DC split across a first scan and a
    refinement scan; all-zero AC bands emit EOB runs)."""
    from mysql_clickhouse_sync_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    for did in (0, 3, 11):
        w, h = 10 + did % 7, 9 + did % 5
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        g = ((did + 37 * (xx // 8) + 101 * (yy // 8)) % 256).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg_progressive(g, quality=100))
        assert np.array_equal(out[:, :, 0], g)


def test_progressive_golden_eobrun():
    """Hand-assembled SOF2 stream whose AC scan covers BOTH blocks
    with ONE EOB-run symbol (0x10: run length 2 + one extra bit) —
    the EOBn machinery our own encoder never emits (it writes plain
    per-block EOBs), pinned against hand-packed bits."""
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof2 = (bytes([8]) + (8).to_bytes(2, "big")
            + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dc_bits = [0, 2] + [0] * 14                 # cats 5, 6 -> '00','01'
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([5, 6])
    ac_bits = [1] + [0] * 15                    # symbol 0x10 -> '0'
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x10])
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    sos_ac = bytes([1, 1, 0x00, 1, 63, 0x00])
    # DC diffs: +16 (cat5 '00' + '10000'), +32 (cat6 '01' + '100000')
    stream = (
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos_dc) + bytes([0x20, 0xC1])
        + _seg(0xDA, sos_ac) + bytes([0x3F])
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert out.shape == (8, 16, 3)
    assert (out[:, :8, 0] == 130).all()         # DC 16 -> gray 130
    assert (out[:, 8:, 0] == 134).all()         # DC 48 -> gray 134


def test_progressive_golden_ac_successive_approximation():
    """Hand-assembled AC successive approximation — the refinement
    paths our encoder never emits: (a) a CORRECTION bit turns a
    first-scan 1<<1 coefficient into 3; (b) a refinement-scan
    INSERTION with a zero-run skip places a new +-1 past a
    zero-history coefficient.  Expected pixels computed from the
    orthonormal IDCT directly."""
    from mysql_clickhouse_sync_spark.operators.jpeg import _dct_matrix

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof1 = (bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    dc_bits = [1] + [0] * 15
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([0])    # cat0 '0'
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    sos_ac1 = bytes([1, 1, 0x00, 1, 63, 0x01])              # Al=1
    sos_acr = bytes([1, 1, 0x00, 1, 63, 0x10])              # Ah=1
    M = _dct_matrix()

    def expect(zig_k, value):
        coef = np.zeros((8, 8))
        nat = ZIGZAG[zig_k]
        coef[nat // 8][nat % 8] = float(value)
        pix = np.einsum("ux,uv,vy->xy", M, coef, M) + 128.0
        return np.clip(np.round(pix), 0, 255).astype(np.uint8)

    # (a) correction: first scan stores 2 at zigzag k=1 ('0' sym 0x01
    # + sign '1', EOB '10' -> 0x6F), refinement EOB then one
    # correction bit '1' (-> 0xBF): final coefficient 3
    ac_bits_a = [1, 1] + [0] * 14               # 0x01 -> '0', EOB '10'
    dht_ac_a = bytes([0x10]) + bytes(ac_bits_a) + bytes([0x01, 0x00])
    s = (
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof1)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac_a)
        + _seg(0xDA, sos_dc) + bytes([0x7F])
        + _seg(0xDA, sos_ac1) + bytes([0x6F])
        + _seg(0xDA, sos_acr) + bytes([0xBF])
        + b"\xff\xd9"
    )
    assert (decode_jpeg(s)[:, :, 0] == expect(1, 3)).all()

    # (b) insertion: first scan all-zero (EOB '10' -> 0xBF); the
    # refinement emits (run=1, size=1) sign '1' -> skips the
    # zero-history k=1 and INSERTS +1 at k=2, then EOB ('0 1 1 0'
    # packed -> 0x6F)
    ac_bits_b = [1, 1, 1] + [0] * 13      # 0x11 '0', EOB '10', 0x01 '110'
    dht_ac_b = bytes([0x10]) + bytes(ac_bits_b) + bytes(
        [0x11, 0x00, 0x01]
    )
    s2 = (
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof1)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac_b)
        + _seg(0xDA, sos_dc) + bytes([0x7F])
        + _seg(0xDA, sos_ac1) + bytes([0xBF])
        + _seg(0xDA, sos_acr) + bytes([0x6F])
        + b"\xff\xd9"
    )
    assert (decode_jpeg(s2)[:, :, 0] == expect(2, 1)).all()


def test_progressive_out_of_order_scan_scripts_rejected():
    """T.81 G.1.1.1.1 scan-script ordering: an AC scan arriving before
    the component's first DC scan, or a refinement (Ah>0) arriving
    before the band's Ah=0 first scan, must fail with the real cause —
    not decode silently against zeroed coefficients."""
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof2 = (bytes([8]) + (8).to_bytes(2, "big")
            + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dc_bits = [0, 2] + [0] * 14
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([5, 6])
    ac_bits = [1] + [0] * 15
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x10])
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    sos_ac = bytes([1, 1, 0x00, 1, 63, 0x00])
    head = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2)
            + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac))
    # (a) the golden EOB-run stream with its scans SWAPPED: AC first
    ac_first = (
        head + _seg(0xDA, sos_ac) + bytes([0x3F])
        + _seg(0xDA, sos_dc) + bytes([0x20, 0xC1]) + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="AC scan before the first DC"):
        decode_jpeg(ac_first)
    # (b) DC refinement (Ss=0, Ah=1) with no prior DC first scan
    sos_dcr = bytes([1, 1, 0x00, 0, 0, 0x10])
    dc_refine_first = (
        head + _seg(0xDA, sos_dcr) + bytes([0x7F]) + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="refinement scan before first"):
        decode_jpeg(dc_refine_first)
    # (c) AC refinement whose band never had its Ah=0 first scan
    sos_acr = bytes([1, 1, 0x00, 1, 63, 0x10])
    ac_refine_first = (
        head + _seg(0xDA, sos_dc) + bytes([0x20, 0xC1])
        + _seg(0xDA, sos_acr) + bytes([0x7F]) + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="refinement scan before first"):
        decode_jpeg(ac_refine_first)


def test_progressive_refine_run_past_band_end_rejected():
    """The refinement path carries the same corrupt-input contract as
    the first-scan path: a decoded nonzero coefficient whose zero-run
    skip overruns the band end raises 'AC run past band end' instead
    of silently dropping the coefficient (hand-packed: band 1..2,
    refinement symbol run=2/size=1 from k=1 runs past se=2)."""
    dqt = bytes([0x00]) + bytes([1] * 64)
    sof1 = (bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    dc_bits = [1] + [0] * 15
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([0])    # cat0 '0'
    ac_bits = [1, 1] + [0] * 14         # '0' -> 0x21, '10' -> EOB
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x21, 0x00])
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    sos_ac1 = bytes([1, 1, 0x00, 1, 2, 0x01])               # Al=1
    sos_acr = bytes([1, 1, 0x00, 1, 2, 0x10])               # Ah=1
    stream = (
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof1)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos_dc) + bytes([0x7F])                # DC diff 0
        + _seg(0xDA, sos_ac1) + bytes([0xBF])               # EOB '10'
        # refinement: sym '0' (run=2,size=1) + sign '1' -> '01' + pad
        + _seg(0xDA, sos_acr) + bytes([0x7F])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="AC run past band end"):
        decode_jpeg(stream)


def test_progressive_golden_restart_intervals():
    """Hand-assembled SOF2 stream with DRI=1: both the DC scan and
    the AC scan carry an RSTn marker between their two blocks, so
    the progressive path's restart handling (byte realign + DC
    predictor reset + EOB-run reset) is pinned — a path our own
    progressive encoder never emits."""
    import struct

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof2 = (bytes([8]) + (8).to_bytes(2, "big")
            + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dc_bits = [0, 2] + [0] * 14
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes([5, 6])
    ac_bits = [1] + [0] * 15
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x00])   # EOB '0'
    dri = _seg(0xDD, struct.pack(">H", 1))
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    sos_ac = bytes([1, 1, 0x00, 1, 63, 0x00])
    # DC block 0: +16 = cat5 '00'+'10000' -> 0x21; RST0; block 1
    # (predictor RESET): 48 = cat6 '01'+'110000' -> 0x70
    dc_data = bytes([0x21]) + b"\xff\xd0" + bytes([0x70])
    ac_data = bytes([0x7F]) + b"\xff\xd0" + bytes([0x7F])     # EOBs
    stream = (
        b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac) + dri
        + _seg(0xDA, sos_dc) + dc_data
        + _seg(0xDA, sos_ac) + ac_data + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert (out[:, :8, 0] == 130).all()
    assert (out[:, 8:, 0] == 134).all()
