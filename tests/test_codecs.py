"""BMP codec + injected-codec seam tests.

The decoder is pinned against HAND-WRITTEN golden bytes (not just a
round-trip through our own encoder), so an encoder/decoder pair
sharing a mirror-image bug — wrong row order or padding on both sides
— cannot pass.
"""

from __future__ import annotations

import numpy as np
import pytest

from mysql_clickhouse_sync_spark.operators.codecs import (
    BmpImageCodec,
    decode_bmp,
    encode_bmp,
    image_codec_for,
)

# 2x2 image, pixels (x, y): (0,0)=RGB(1,2,3) (1,0)=(4,5,6)
#                           (0,1)=(7,8,9)  (1,1)=(10,11,12)
_PIXELS = np.array(
    [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
)


def _headers(height: int, body_len: int) -> bytes:
    return (
        b"BM"
        + (54 + body_len).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)       # width
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")                    # planes
        + (24).to_bytes(2, "little")                   # bpp
        + (0).to_bytes(4, "little")                    # BI_RGB
        + body_len.to_bytes(4, "little")
        + (2835).to_bytes(4, "little", signed=True) * 2
        + (0).to_bytes(4, "little") * 2
    )


# Bottom-up (positive height): bottom image row stored FIRST, BGR byte
# order, each 6-byte row padded to 8.
_GOLDEN = _headers(2, 16) + bytes(
    [9, 8, 7, 12, 11, 10, 0, 0,      # image row y=1
     3, 2, 1, 6, 5, 4, 0, 0]         # image row y=0
)

# Top-down (negative height): image row order as stored.
_GOLDEN_TOP_DOWN = _headers(-2, 16) + bytes(
    [3, 2, 1, 6, 5, 4, 0, 0,
     9, 8, 7, 12, 11, 10, 0, 0]
)


def test_decode_golden_bytes():
    assert np.array_equal(decode_bmp(_GOLDEN), _PIXELS)


def test_decode_top_down_golden_bytes():
    assert np.array_equal(decode_bmp(_GOLDEN_TOP_DOWN), _PIXELS)


def test_encode_matches_golden_bytes():
    assert encode_bmp(_PIXELS) == _GOLDEN


def test_round_trip_all_padding_widths():
    """Widths 1..9 hit every row-padding remainder (0..3 pad bytes);
    heights 1..4 hit single-row and multi-row flips."""
    rng = np.random.default_rng(7)
    for w in range(1, 10):
        for h in range(1, 5):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img), (w, h)


def test_decode_rejects_malformed():
    with pytest.raises(ValueError, match="shorter than the headers"):
        decode_bmp(b"BM")
    with pytest.raises(ValueError, match="bad magic"):
        decode_bmp(b"XX" + _GOLDEN[2:])
    bad_bpp = bytearray(_GOLDEN)
    bad_bpp[28] = 32
    with pytest.raises(ValueError, match="bpp=32"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(_GOLDEN[:-4])


def test_encode_rejects_wrong_shape():
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((2, 2, 3), dtype=np.int32))
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((2, 2), dtype=np.uint8))


def test_encode_rejects_zero_dimensions():
    # symmetric round-trip contract: geometry the decoder rejects must
    # not be encodable either
    with pytest.raises(ValueError, match="non-empty"):
        encode_bmp(np.zeros((0, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="non-empty"):
        encode_bmp(np.zeros((3, 0, 3), dtype=np.uint8))


def test_unregister_and_temporary_codec_restore_prior():
    from mysql_clickhouse_sync_spark.operators import codecs

    class A:
        pass

    class B:
        pass

    # unregister of an unknown MIME is an idempotent no-op
    codecs.unregister_image_codec("image/never-registered")
    # temporary_codec restores a PREVIOUS registration, not just absence
    codecs.register_image_codec("image/x-tmp", A())
    try:
        with codecs.temporary_codec("image", "image/x-tmp", B()):
            assert isinstance(codecs.image_codec_for("image/x-tmp"), B)
        assert isinstance(codecs.image_codec_for("image/x-tmp"), A)
    finally:
        codecs.unregister_image_codec("image/x-tmp")
    assert codecs.image_codec_for("image/x-tmp") is None
    with pytest.raises(ValueError, match="unknown codec kind"):
        with codecs.temporary_codec("text", "x", A()):
            pass


def test_registry_default_and_injection():
    from mysql_clickhouse_sync_spark.operators.codecs import PngImageCodec
    from mysql_clickhouse_sync_spark.operators.jpeg import JpegImageCodec

    assert isinstance(image_codec_for("image/bmp"), BmpImageCodec)
    assert isinstance(image_codec_for("image/png"), PngImageCodec)
    assert isinstance(image_codec_for("image/jpeg"), JpegImageCodec)
    assert image_codec_for("image/webp") is None
    assert image_codec_for(None) is None


def test_resize_nearest_index_math():
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        resize_nearest,
    )

    img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(img, 2, 1)
    # xs = [0, 2], ys = [0] -> pixels (0,0) and (2,0)
    assert np.array_equal(out, img[[0]][:, [0, 2]])
    up = resize_nearest(img, 8, 4)
    assert up.shape == (4, 8, 3)
    # corners map to source corners under floor(i*src/dst)
    assert np.array_equal(up[0, 0], img[0, 0])
    assert np.array_equal(up[-1, -1], img[-1, -1])


def test_resize_images_real_path(spark):
    """decode -> nearest resample -> re-encode through the registry:
    the output payload decodes to exactly resize_nearest(original)."""
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(encode_bmp(img)), 7, 5, None)],
        MEDIA_SCHEMA,
    )
    rows = resize_images(media, 4, 3, decode_kind="real").collect()
    assert len(rows) == 1
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        resize_nearest,
    )

    out = decode_bmp(bytes(rows[0]["payload"]))
    assert np.array_equal(out, resize_nearest(img, 4, 3))


def test_decode_and_featurize_real_bmp(spark):
    """The real feature path through the injected BMP codec: feature
    carries geometry + exact channel means; unregistered MIME still
    raises naming the registration hook."""
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_and_featurize,
    )

    img = np.full((3, 4, 3), 10, dtype=np.uint8)
    img[:, :, 1] = 20
    img[:, :, 2] = 30
    media = spark.createDataFrame(
        [(7, "image", "image/bmp", bytearray(encode_bmp(img)), 4, 3, None)],
        MEDIA_SCHEMA,
    )
    row = decode_and_featurize(media, decode_kind="real").collect()[0]
    feat = row["feature"]
    assert feat[:5] == [4.0, 3.0, 10.0, 20.0, 30.0]

    webp = spark.createDataFrame(
        [(8, "image", "image/webp", bytearray(b"x"), 1, 1, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no image codec registered"):
        decode_and_featurize(webp, decode_kind="real").collect()


def test_image_stats_pins_orientation_and_padding(spark):
    """image_stats corner pixels distinguish a correct decode from a
    row-flipped or padding-confused one: width 5 forces padding, the
    gradient makes every pixel unique."""
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats,
    )

    xx = np.arange(5)[None, :]
    yy = np.arange(3)[:, None]
    img = np.stack(
        [(1 + 3 * xx + 7 * yy) % 256,
         (2 + 5 * xx + yy) % 256,
         (3 + xx + 11 * yy) % 256],
        axis=-1,
    ).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(encode_bmp(img)), 5, 3, None)],
        MEDIA_SCHEMA,
    )
    r = image_stats(media).collect()[0]
    assert (r["width"], r["height"]) == (5, 3)
    assert (r["r00"], r["g00"], r["b00"]) == (1, 2, 3)
    assert (r["r_last"], r["g_last"], r["b_last"]) == (
        int(img[2, 4, 0]), int(img[2, 4, 1]), int(img[2, 4, 2])
    )
    n = 15
    assert r["mean_r"] == img[:, :, 0].astype(np.int64).sum() / n
    assert r["n_bytes"] == 54 + 3 * (((3 * 5 + 3) // 4) * 4)


def test_custom_codec_injection_end_to_end(spark):
    """The registry is the deployment seam: a user-registered codec
    (a PIL stand-in here) must be picked up by the operators for its
    MIME type without touching operator code, and deregistration must
    restore the honest NotImplementedError."""
    from mysql_clickhouse_sync_spark.operators import codecs
    from mysql_clickhouse_sync_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats,
    )

    class FakeCodec:
        """Pretends every payload is a 2x1 image whose first pixel is
        the payload's first byte."""

        def decode(self, payload):
            b = payload[0] if payload else 0
            return np.array([[[b, 0, 0], [0, 0, 0]]], dtype=np.uint8)

        def encode(self, rgb):
            return bytes([int(rgb[0, 0, 0])])

    media = spark.createDataFrame(
        [(1, "image", "image/x-fake", bytearray(b"\x2a"), 2, 1, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no image codec registered"):
        image_stats(media).collect()

    # scoped registration: the context manager restores prior state
    # (absence here) on exit, so the test never touches private dicts
    with codecs.temporary_codec("image", "image/x-fake", FakeCodec()):
        row = image_stats(media).collect()[0]
        assert (row["width"], row["height"]) == (2, 1)
        assert row["r00"] == 0x2A and row["r_last"] == 0
    with pytest.raises(Exception, match="no image codec registered"):
        image_stats(media).collect()


# -- PNG codec ---------------------------------------------------------

def _png_golden_bytes():
    """Hand-constructed 3x2 RGB PNG, independent of encode_png: chunks
    assembled field-by-field in the test, scanlines written with
    EXPLICIT filter bytes (row 0: None, row 1: Sub) so the decoder is
    pinned against the spec, not against our encoder's choices.

    pixels (row-major):  (1,2,3) (4,5,6) (250,251,252)
                         (9,8,7) (19,18,17) (29,28,27)
    row 1 is Sub-filtered: raw = recon[x] - recon[x-3].
    """
    import struct as _st
    import zlib

    def chunk(ctype, data):
        return (_st.pack(">I", len(data)) + ctype + data
                + _st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = _st.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    row0 = bytes([0, 1, 2, 3, 4, 5, 6, 250, 251, 252])
    # row 1 recon: 9 8 7 19 18 17 29 28 27 -> Sub deltas: first pixel
    # raw (left=0), then recon[x]-recon[x-3] = 10 10 10, 10 10 10
    row1 = bytes([1, 9, 8, 7, 10, 10, 10, 10, 10, 10])
    idat = zlib.compress(row0 + row1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def test_png_decode_golden_bytes():
    from mysql_clickhouse_sync_spark.operators.codecs import decode_png

    rgb = decode_png(_png_golden_bytes())
    assert rgb.shape == (2, 3, 3) and rgb.dtype == np.uint8
    assert rgb[0].tolist() == [[1, 2, 3], [4, 5, 6], [250, 251, 252]]
    assert rgb[1].tolist() == [[9, 8, 7], [19, 18, 17], [29, 28, 27]]


def test_png_decode_all_filter_types():
    """One hand-filtered scanline per filter type (None, Sub, Up,
    Average, Paeth) against reference reconstruction computed by the
    spec equations in pure Python — the decoder's five paths each get
    a non-degenerate row (values chosen to wrap mod 256)."""
    import struct as _st
    import zlib

    from mysql_clickhouse_sync_spark.operators.codecs import decode_png

    w, h = 4, 5
    rng = np.random.RandomState(7)
    recon = rng.randint(0, 256, size=(h, 3 * w)).astype(np.int32)

    def pae(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    scan = bytearray()
    for y in range(h):
        f = y % 5
        scan.append(f)
        for x in range(3 * w):
            left = recon[y, x - 3] if x >= 3 else 0
            up = recon[y - 1, x] if y else 0
            upleft = recon[y - 1, x - 3] if (y and x >= 3) else 0
            raw = recon[y, x]
            if f == 1:
                raw = raw - left
            elif f == 2:
                raw = raw - up
            elif f == 3:
                raw = raw - (left + up) // 2
            elif f == 4:
                raw = raw - pae(left, up, upleft)
            scan.append(int(raw) % 256)

    def chunk(ctype, data):
        return (_st.pack(">I", len(data)) + ctype + data
                + _st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", _st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(scan)))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.reshape(h, 3 * w).tolist() == (recon % 256).tolist()


def test_png_round_trip_exercises_every_filter():
    """encode_png cycles filters 0..4 across rows; any image with
    h >= 5 therefore round-trips through every reconstruction path."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(13)
    for h, w in [(5, 1), (6, 4), (9, 7), (1, 1)]:
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


def test_png_rejects_malformed():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxx"[:14])
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"NOTAPNG!" + b"\x00" * 24)
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        # flip the color-type byte inside IHDR (offset: 8 sig + 8
        # len/type + 9th IHDR byte)
        bad = bytearray(good)
        bad[8 + 8 + 9] = 6          # RGBA
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2, 3), dtype=np.int32))
    with pytest.raises(ValueError, match="non-empty"):
        encode_png(np.zeros((0, 2, 3), dtype=np.uint8))


# -- WAV codec ---------------------------------------------------------

def _wav_golden_bytes():
    """Hand-constructed RIFF/WAVE, independent of encode_wav: 16-bit
    PCM STEREO at 22050 Hz, two frames — (16384, -16384), (8192, 0)
    — so the mono downmix must yield [0.0, 0.125]."""
    import struct as _st

    fmt = _st.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    data = _st.pack("<4h", 16384, -16384, 8192, 0)
    body = (b"WAVE"
            + b"fmt " + _st.pack("<I", len(fmt)) + fmt
            + b"data" + _st.pack("<I", len(data)) + data)
    return b"RIFF" + _st.pack("<I", len(body)) + body


def test_wav_decode_golden_bytes_stereo_downmix():
    from mysql_clickhouse_sync_spark.operators.codecs import decode_wav

    wave, rate = decode_wav(_wav_golden_bytes())
    assert rate == 22050
    assert wave.tolist() == [0.0, 0.125]


def test_wav_round_trip_8_and_16_bit():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    x = (np.arange(-128, 128) / 128.0)
    for bits, tol in ((16, 1 / 32768.0), (8, 1 / 128.0)):
        wave, rate = decode_wav(encode_wav(x, rate=16000, bits=bits))
        assert rate == 16000
        assert np.abs(wave - np.clip(x, -1, 1)).max() <= tol
    # 8-bit dyadic values with denominator 128 round-trip EXACTLY
    # (the property media_audio_stats' closed-form oracle relies on)
    d = (np.arange(90) * 13 % 256 - 128) / 128.0
    wave, _ = decode_wav(encode_wav(d, bits=8))
    assert wave.tolist() == d.tolist()


def test_wav_rejects_malformed():
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + _st.pack("<I", 4) + b"WAVE")
    good = bytearray(encode_wav(np.zeros(4), bits=16))
    # audio_format byte inside fmt chunk (12 riff/wave + 8 hdr)
    good[20] = 85                    # MP3 format tag
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav(bytes(good))
    with pytest.raises(ValueError, match="bits=16|8"):
        encode_wav(np.zeros(4), bits=24)


def test_wav_registry_default():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        WavAudioCodec,
        audio_codec_for,
    )

    assert isinstance(audio_codec_for("audio/wav"), WavAudioCodec)
    assert audio_codec_for("audio/mpeg") is None


def test_png_wav_short_header_chunks_raise_valueerror():
    """Malformed-but-self-consistent chunk streams (IHDR shorter than
    13 bytes, fmt shorter than 16) must fail with the promised
    ValueError, not a bare struct.error (review finding)."""
    import struct as _st
    import zlib

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_png,
        decode_wav,
    )

    def chunk(ctype, data):
        return (_st.pack(">I", len(data)) + ctype + data
                + _st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    short_ihdr = (b"\x89PNG\r\n\x1a\n"
                  + chunk(b"IHDR", b"\x00" * 5)
                  + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR is 5 bytes"):
        decode_png(short_ihdr)

    short_fmt = b"\x00" * 8
    body = (b"WAVE"
            + b"fmt " + _st.pack("<I", len(short_fmt)) + short_fmt
            + b"data" + _st.pack("<I", 0))
    wav = b"RIFF" + _st.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk is 8 bytes"):
        decode_wav(wav)


def test_wav_encode_rejects_empty():
    from mysql_clickhouse_sync_spark.operators.codecs import encode_wav

    with pytest.raises(ValueError, match="non-empty"):
        encode_wav(np.array([]))


# -- G.711 mu-law ------------------------------------------------------

def test_ulaw_decode_golden_codewords():
    """Hand-computed spec values, independent of our encoder: the
    zero pair (0xFF positive zero, 0x7F negative zero), the extremes
    (0x00 -> -32124, 0x80 -> +32124 — the spec's max magnitude), and
    one mid-segment pair (u=0x18: exp 1, mant 8 -> CCITT
    exp_lut[1]=132 plus 8<<4 = 260)."""
    from mysql_clickhouse_sync_spark.operators.codecs import ulaw_to_linear

    assert list(ulaw_to_linear([0xFF, 0x7F, 0x00, 0x80, 0xE7, 0x67])) == [
        0, 0, -32124, 32124, 260, -260,
    ]


def test_ulaw_encode_decode_identity_on_codewords():
    """encode(decode(c)) == c for every codeword EXCEPT the redundant
    negative zero 0x7F, which re-encodes to the canonical positive
    zero 0xFF — the one many-to-one point of the spec's grid."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        linear_to_ulaw,
        ulaw_to_linear,
    )

    codes = np.arange(256, dtype=np.uint8)
    rt = linear_to_ulaw(ulaw_to_linear(codes))
    diffs = [(int(c), int(r)) for c, r in zip(codes, rt) if c != r]
    assert diffs == [(0x7F, 0xFF)]


def test_ulaw_wav_container_golden_bytes():
    """Hand-constructed RIFF/WAVE with audio_format=7 (independent of
    encode_wav_ulaw_codes): three known codewords decode through the
    registry WAV path to their spec PCM values / 32768."""
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import decode_wav

    fmt = _st.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes([0xFF, 0x00, 0xE7])
    body = (b"WAVE"
            + b"fmt " + _st.pack("<I", len(fmt)) + fmt
            + b"data" + _st.pack("<I", len(data)) + data)
    wave, rate = decode_wav(b"RIFF" + _st.pack("<I", len(body)) + body)
    assert rate == 8000
    assert wave.tolist() == [0.0, -32124 / 32768.0, 260 / 32768.0]


def test_ulaw_wav_round_trip_and_companding_error():
    """Production float path: encode_wav_ulaw -> decode_wav lands on
    the companded grid with bounded error (logarithmic: coarse near
    full scale, fine near zero), and codes-in == exact samples out."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_ulaw,
        encode_wav_ulaw_codes,
        ulaw_to_linear,
    )

    t = np.sin(np.linspace(0.0, 6.0, 200)) * 0.7
    wave, rate = decode_wav(encode_wav_ulaw(t, rate=16_000))
    assert rate == 16_000
    assert np.abs(wave - t).max() < 0.03
    codes = (np.arange(90) * 29 % 256).astype(np.uint8)
    wave2, _ = decode_wav(encode_wav_ulaw_codes(codes, 8_000))
    assert np.array_equal(
        wave2, ulaw_to_linear(codes).astype(np.float64) / 32768.0
    )


def test_ulaw_wav_rejects_malformed():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_ulaw,
        encode_wav_ulaw_codes,
    )

    good = bytearray(encode_wav_ulaw(np.zeros(4)))
    good[34] = 16                    # bits byte inside the fmt chunk
    with pytest.raises(ValueError, match="mu-law with bits=16"):
        decode_wav(bytes(good))
    with pytest.raises(ValueError, match="non-empty"):
        encode_wav_ulaw(np.array([]))
    with pytest.raises(ValueError, match="non-empty"):
        encode_wav_ulaw_codes(np.array([], dtype=np.uint8))


# -- AVI demux ---------------------------------------------------------

def _avi_golden_bytes():
    """Hand-constructed minimal AVI, independent of encode_avi: RIFF
    'AVI ' with LIST(hdrl){avih: 250000 usec/frame, 3 frames} and
    LIST(movi){three 00db chunks b"F0", b"F1x", b"F2"} — the odd-size
    middle chunk carries a RIFF pad byte the walker must skip."""
    import struct as _st

    def chunk(ctype, data):
        pad = b"\x00" if len(data) & 1 else b""
        return ctype + _st.pack("<I", len(data)) + data + pad

    avih = _st.pack("<IIIII", 250000, 0, 0, 0, 3) + b"\x00" * 36
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST",
        b"movi" + chunk(b"00db", b"F0") + chunk(b"00db", b"F1x")
        + chunk(b"00db", b"F2"),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def test_avi_demux_golden_bytes():
    from mysql_clickhouse_sync_spark.operators.codecs import demux_avi

    usec, frames = demux_avi(_avi_golden_bytes())
    assert usec == 250000
    assert frames == [b"F0", b"F1x", b"F2"]     # odd-size pad skipped


def test_avi_round_trip_and_sampling_cadence():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        demux_avi,
        encode_avi,
    )

    frames = [bytes([i]) * (3 + i) for i in range(6)]
    avi = encode_avi(frames, 500_000)           # 2 fps: ts 0..2500
    usec, got = demux_avi(avi)
    assert usec == 500_000 and got == frames
    d = AviDemuxer()
    # 1000 ms buckets -> first frame of each second: k = 0, 2, 4
    assert [(i, ts) for i, ts, _ in d.frames(avi, 1000)] == [
        (0, 0), (1, 1000), (2, 2000),
    ]
    # cadence finer than the frame period -> every frame sampled
    assert [ts for _, ts, _ in d.frames(avi, 400)] == [
        0, 500, 1000, 1500, 2000, 2500,
    ]


def test_avi_rejects_malformed():
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        demux_avi,
        encode_avi,
    )

    with pytest.raises(ValueError, match="RIFF"):
        demux_avi(b"RIFF" + _st.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="missing avih"):
        demux_avi(b"RIFF" + _st.pack("<I", 4) + b"AVI ")
    with pytest.raises(ValueError, match="non-empty"):
        encode_avi([], 1000)
    with pytest.raises(ValueError, match="usec_per_frame"):
        encode_avi([b"x"], 0)


def test_video_registry_default():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        video_demuxer_for,
    )

    assert isinstance(video_demuxer_for("video/x-msvideo"), AviDemuxer)
    assert video_demuxer_for("video/mp4") is None


def test_lossless_codec_round_trip_property():
    """Property fuzz over the LOSSLESS codecs (BMP raw, PNG DEFLATE+
    filters): any geometry, any content, bit-exact round trip — the
    blanket armor behind the targeted per-filter/per-padding tests.
    (JPEG, the lossy codec, has its own theory-bounded property in
    tests/test_jpeg.py.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    prop()


def test_wav_grid_round_trip_property():
    """Property fuzz for PCM WAV: samples already ON the quantization
    grid round-trip exactly at both bit depths, any clip length, any
    rate — the closed-form-oracle exactness contract the graded row
    builds on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 200),
        rate=st.sampled_from([8000, 16000, 44100]),
        bits=st.sampled_from([8, 16]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(n, rate, bits, seed):
        rng = np.random.default_rng(seed)
        if bits == 8:
            x = (rng.integers(0, 256, size=n) - 128) / 128.0
        else:
            x = (rng.integers(-32768, 32768, size=n)) / 32768.0
        wav = encode_wav(x, rate=rate, bits=bits)
        y, got_rate = decode_wav(wav)
        assert got_rate == rate
        assert np.array_equal(y, x)

    prop()


def test_motion_jpeg_composition():
    """Motion JPEG (the real-world pairing of the two seams): an AVI
    container whose frames are baseline JPEG bytes demuxes through
    AviDemuxer and pixel-decodes through JpegImageCodec — container
    walk and image codec compose with zero coupling.  Frames are
    per-8x8-block-constant mosaics at quality 100, so every sampled
    frame decodes bit-exactly."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        encode_avi,
    )
    from mysql_clickhouse_sync_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    mosaics = []
    for k in range(4):
        xx, yy = np.meshgrid(np.arange(12), np.arange(10))
        g = ((17 * k + 37 * (xx // 8) + 101 * (yy // 8)) % 256).astype(
            np.uint8
        )
        mosaics.append(g)
    avi = encode_avi(
        [encode_jpeg(g, quality=100) for g in mosaics], 500_000
    )
    sampled = list(AviDemuxer().frames(avi, 1000))   # frames 0 and 2
    assert [(i, ts) for i, ts, _ in sampled] == [(0, 0), (1, 1000)]
    for (_, _, frame), k in zip(sampled, (0, 2)):
        rgb = decode_jpeg(frame)
        assert np.array_equal(rgb[:, :, 0], mosaics[k])


# ---------------------------------------------------------------- GIF


def test_gif_decode_golden_bytes():
    """Hand-assembled minimal GIF87a (2x1, 4-color table, LZW codes
    [clear, 1, 2, end] hand-packed LSB-first into 0x8C 0x0A) — pins
    the decoder independently of our own encoder: byte order, LSD
    layout, color-table indexing and the LZW bit packing all checked
    against bytes a human worked out from the public spec."""
    import struct

    from mysql_clickhouse_sync_spark.operators.codecs import decode_gif

    gct = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )
    golden = (
        b"GIF87a" + struct.pack("<HH", 2, 1)
        + bytes([0x80 | (7 << 4) | 0x01, 0, 0]) + gct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2]) + bytes([2, 0x8C, 0x0A]) + b"\x00\x3b"
    )
    out = decode_gif(golden)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [40, 50, 60]    # palette[1]
    assert out[0, 1].tolist() == [70, 80, 90]    # palette[2]


def test_gif_interlace_extension_skip_and_lct():
    """Interlaced image data (4-pass row order), an 89a graphic-
    control extension (skipped; transparency index IGNORED by the
    RGB contract), and a LOCAL color table overriding the global
    one — assembled by hand around the raw LZW encoder so the
    decoder's block walk is what's under test."""
    import struct

    from mysql_clickhouse_sync_spark.operators.codecs import (
        _interlace_order,
        _lzw_encode,
        decode_gif,
    )

    rng = np.random.default_rng(3)
    h, w = 13, 5
    lct = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (h, w))
    stored = idx[_interlace_order(h)]          # stream row order
    lzw = _lzw_encode(stored.ravel(), 3)
    buf = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    buf += bytes([0, 0, 0])                    # NO global table
    buf += bytes([0x21, 0xF9, 4, 1, 0, 0, 2, 0])   # GCE w/ transparency
    # interlaced + local color table (8 entries)
    buf += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes(
        [0x80 | 0x40 | 0x02]
    )
    buf += lct.tobytes()
    buf.append(3)
    for p in range(0, len(lzw), 255):
        c = lzw[p : p + 255]
        buf.append(len(c))
        buf += c
    buf += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(buf)), lct[idx])


def test_gif_round_trip_property():
    """Any geometry, any palette size 1..256 (incl. widths that grow
    the LZW code size to 9+ bits and images big enough to fill the
    4096-entry dictionary and force a CLEAR reset): bit-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_gif,
        encode_gif,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ncol=st.integers(1, 256),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(h, w, ncol, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    prop()
    # dictionary-reset path: > 4096 distinct phrases
    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    big = pal[rng.integers(0, 256, (80, 300))]
    assert np.array_equal(decode_gif(encode_gif(big)), big)


def test_gif_rejects_malformed_with_real_cause():
    import struct

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_gif,
        encode_gif,
    )

    with pytest.raises(ValueError, match="bad magic"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="shorter than the header"):
        decode_gif(b"GIF87a")
    with pytest.raises(ValueError, match="no image descriptor"):
        decode_gif(
            b"GIF87a" + struct.pack("<HH", 1, 1) + bytes([0, 0, 0])
            + b"\x3b"
        )
    with pytest.raises(ValueError, match="no color table"):
        decode_gif(
            b"GIF87a" + struct.pack("<HH", 1, 1) + bytes([0, 0, 0])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
            + bytes([2, 1, 0x00, 0x00]) + b"\x3b"
        )
    good = encode_gif(_PIXELS)
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif(good[: len(good) - 6])
    # > 256 distinct colors is a hard error, not silent quantization
    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(noisy)
    with pytest.raises(ValueError, match="uint8"):
        encode_gif(np.zeros((2, 2, 3), dtype=np.int64))
    with pytest.raises(ValueError, match="non-empty"):
        encode_gif(np.zeros((0, 2, 3), dtype=np.uint8))


def test_gif_registry_default():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        GifImageCodec,
        image_codec_for,
    )

    codec = image_codec_for("image/gif")
    assert isinstance(codec, GifImageCodec)
    assert np.array_equal(codec.decode(codec.encode(_PIXELS)), _PIXELS)


# -- Microsoft RLE8 (BI_RLE8) interframe video -------------------------

def test_rle8_decode_golden_opcodes():
    """Hand-packed opcode streams, independent of our encoder: runs,
    the DELTA position escape, absolute mode with its word pad, EOL
    and EOB — each painting exactly the spec'd pixels and leaving
    skipped pixels untouched."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_rle8_into,
    )

    # delta escape to bottom-up row 2, paint 3 of 5 pixels with 9
    buf = np.zeros((4, 5), np.uint8)
    decode_rle8_into(bytes((0, 2, 0, 2, 3, 9, 0, 1)), buf)
    assert buf[2, :3].tolist() == [9, 9, 9] and int(buf.sum()) == 27
    # absolute mode: 3 literals + pad byte, then EOB
    buf2 = np.full((2, 4), 7, np.uint8)
    decode_rle8_into(bytes((0, 3, 1, 2, 3, 0, 0, 1)), buf2)
    assert buf2[0].tolist() == [1, 2, 3, 7]       # 4th pixel retained
    # EOL advances a row; runs resume at x=0
    buf3 = np.zeros((2, 3), np.uint8)
    decode_rle8_into(bytes((2, 5, 0, 0, 1, 6, 0, 1)), buf3)
    assert buf3[0].tolist() == [5, 5, 0]
    assert buf3[1].tolist() == [6, 0, 0]


def test_rle8_encode_decode_round_trip_and_delta_skips():
    """Keyframe + delta round trip through the production encoder:
    unchanged rows are skipped (smaller frame), changed rows repaint,
    and the decoded state equals the target frame exactly.  Runs
    longer than 255 split per the two-byte opcode limit."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_rle8_into,
        encode_rle8_frame,
    )

    rng = np.random.RandomState(11)
    f0 = rng.randint(0, 5, (7, 300), dtype=np.uint8)  # forces run split
    f1 = f0.copy()
    f1[3, 10:40] = 200
    k, d = encode_rle8_frame(f0), encode_rle8_frame(f1, prev=f0)
    assert len(d) < len(k)
    buf = np.zeros(f0.shape, np.uint8)
    decode_rle8_into(k, buf)
    assert np.array_equal(buf[::-1], f0)
    decode_rle8_into(d, buf)
    assert np.array_equal(buf[::-1], f1)


def test_rle8_strf_round_trip_and_validation():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        _parse_rle8_strf,
        rle8_strf,
    )

    pal = np.stack(
        [np.arange(64) * 3 % 256, np.arange(64) * 5 % 256,
         np.arange(64) * 7 % 256], axis=1
    ).astype(np.uint8)
    w, h, pal2 = _parse_rle8_strf(rle8_strf(9, 5, pal))
    assert (w, h) == (9, 5)
    assert np.array_equal(pal2[:64], pal) and int(pal2[64:].sum()) == 0
    with pytest.raises(ValueError, match="palette"):
        rle8_strf(4, 4, np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError, match="not an RLE8 strf"):
        _parse_rle8_strf(rle8_strf(9, 5, pal)[:16] + b"\x00" * 24)


def test_rle8_rejects_malformed_with_real_cause():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_rle8_into,
        encode_rle8_frame,
    )

    buf = np.zeros((2, 4), np.uint8)
    with pytest.raises(ValueError, match="run past row end"):
        decode_rle8_into(bytes((9, 1, 0, 1)), buf)
    with pytest.raises(ValueError, match="opcode ran out"):
        decode_rle8_into(bytes((2, 1, 3)), buf)
    with pytest.raises(ValueError, match="delta past buffer"):
        decode_rle8_into(bytes((0, 2, 9, 9, 0, 1)), buf)
    with pytest.raises(ValueError, match="absolute run ran out"):
        decode_rle8_into(bytes((0, 3, 1)), buf)
    with pytest.raises(ValueError, match="non-empty 2-D"):
        encode_rle8_frame(np.zeros((0, 3), np.uint8))


def test_mrle_avi_interframe_sampling_end_to_end():
    """'MRLE' AVI through the demuxer: every physical frame applies to
    the carried pixel state (interframe), sampled frames emit as
    lossless BMPs — and a sampled frame's content reflects ALL deltas
    before it, not just its own bytes."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        decode_bmp,
        demux_avi_full,
        encode_avi,
        encode_rle8_frame,
        rle8_strf,
    )

    pal = np.stack(
        [np.arange(16) * 11 % 256, np.arange(16) * 5 % 256,
         np.arange(16) * 3 % 256], axis=1
    ).astype(np.uint8)
    f0 = np.tile(np.arange(4, dtype=np.uint8)[:, None], (1, 6))
    f1 = f0.copy(); f1[1, :] = 10
    f2 = f1.copy(); f2[3, :] = 12
    frames = [
        encode_rle8_frame(f0),
        encode_rle8_frame(f1, prev=f0),
        encode_rle8_frame(f2, prev=f1),
    ]
    avi = encode_avi(
        frames, 500_000, fourcc=b"MRLE", strf=rle8_strf(6, 4, pal)
    )
    usec, raw, fourcc, strf = demux_avi_full(avi)
    assert (usec, len(raw), fourcc) == (500_000, 3, b"MRLE")
    samples = list(AviDemuxer().frames(avi, 1000))
    assert [(i, t) for i, t, _ in samples] == [(0, 0), (1, 1000)]
    assert np.array_equal(decode_bmp(samples[0][2]), pal[f0])
    # frame 2 carries BOTH deltas: its own row 3 AND frame 1's row 1
    assert np.array_equal(decode_bmp(samples[1][2]), pal[f2])


def test_plain_dib_avi_demux_unchanged():
    """The default 'DIB ' path still yields raw frame chunks (the
    pre-RLE8 contract media_video_frames/mjpeg rely on)."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        encode_avi,
    )

    avi = encode_avi([b"AA", b"BB", b"CC"], 500_000)
    samples = list(AviDemuxer().frames(avi, 1000))
    assert [(i, t, bytes(f)) for i, t, f in samples] == [
        (0, 0, b"AA"), (1, 1000, b"CC"),
    ]


# -- IMA ADPCM (WAV format 0x11) ---------------------------------------

def test_adpcm_golden_state_steps_and_block():
    """Hand-computed spec steps, independent of our encoder: from
    (pred 0, index 0), code 7 -> diff 0+1+3+7=11 (step 7), index +8;
    then code 15 (step 16) -> diff 2+4+8+16=30, sign bit -> -19,
    index 16.  The packed block (low nibble first) decodes to exactly
    that sample path."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        _ima_step,
        ima_adpcm_decode_block,
    )

    assert _ima_step(0, 0, 7) == (11, 8)
    assert _ima_step(11, 8, 15) == (-19, 16)
    blk = bytes([0, 0, 0, 0, 0x7 | (0xF << 4)])
    assert ima_adpcm_decode_block(blk, 3).tolist() == [0, 11, -19]


def test_adpcm_codes_container_round_trip():
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_adpcm_codes,
    )

    codes = (np.arange(37) * 5 % 16).astype(np.uint8)
    x, rate = decode_wav(encode_wav_adpcm_codes(-1024, 12, codes, 8000))
    assert rate == 8000 and len(x) == 38
    assert x[0] == -1024 / 32768.0
    # clamps hold: every decoded sample is a representable int16
    pcm = x * 32768.0
    assert np.all(pcm == np.round(pcm))
    assert pcm.min() >= -32768 and pcm.max() <= 32767


def test_adpcm_production_encoder_error_bound_and_blocks():
    """Multi-block production path (block_align 256 -> 505 samples per
    block): length preserved across the block boundary, companding
    error bounded, and the fact chunk caps trailing pad nibbles."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_adpcm,
    )

    t = np.sin(np.linspace(0.0, 12.0, 1500)) * 0.6
    x, rate = decode_wav(encode_wav_adpcm(t, rate=16_000))
    assert rate == 16_000 and len(x) == 1500
    assert np.abs(x - t).max() < 0.06


def test_adpcm_rejects_malformed_with_real_cause():
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_adpcm_codes,
        ima_adpcm_decode_block,
    )

    with pytest.raises(ValueError, match="step index 99"):
        ima_adpcm_decode_block(_st.pack("<hBB", 0, 99, 0) + b"\x00", 2)
    with pytest.raises(ValueError, match="header is 4"):
        ima_adpcm_decode_block(b"\x00\x00", 1)
    with pytest.raises(ValueError, match="samples from"):
        ima_adpcm_decode_block(_st.pack("<hBB", 0, 0, 0) + b"\x00", 9)
    with pytest.raises(ValueError, match="0..15"):
        encode_wav_adpcm_codes(0, 0, [99])
    # channels=2 on a MONO-shaped container: the stereo geometry
    # check (8-byte header, per-channel group math) rejects it with
    # the real cause instead of mis-decoding the interleave
    good = bytearray(encode_wav_adpcm_codes(0, 0, [1, 2], 8000))
    good[22] = 2                     # channels byte inside fmt
    with pytest.raises(ValueError, match="block_align"):
        decode_wav(bytes(good))
    many = bytearray(encode_wav_adpcm_codes(0, 0, [1, 2], 8000))
    many[22] = 3                     # >2 channels: honest unsupported
    with pytest.raises(ValueError, match="mono and stereo only"):
        decode_wav(bytes(many))
    bad_bits = bytearray(encode_wav_adpcm_codes(0, 0, [1, 2], 8000))
    bad_bits[34] = 16                # bits-per-sample byte inside fmt
    with pytest.raises(ValueError, match="spec: 4"):
        decode_wav(bytes(bad_bits))


def test_mrle_without_strf_fails_with_real_cause():
    """An 'MRLE' stream whose strf is missing cannot be decoded (the
    geometry + palette live in the format block) — the demuxer must
    name the real cause instead of handing RLE opcodes to an image
    decoder downstream."""
    from mysql_clickhouse_sync_spark.operators.codecs import (
        AviDemuxer,
        encode_avi,
    )

    avi = encode_avi([b"\x00\x01"], 500_000, fourcc=b"MRLE")
    with pytest.raises(ValueError, match="MRLE.*without an RLE8 strf"):
        list(AviDemuxer().frames(avi, 1000))


def test_adpcm_header_only_block_is_one_sample():
    """A block of exactly 4 bytes (header, zero nibble bytes) is a
    legal 1-sample block — the header sample IS an output sample
    (review finding: the block walk previously excluded it)."""
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import decode_wav

    block = _st.pack("<hBB", -512, 3, 0)
    fmt = _st.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, len(block), 4, 2, 1)
    body = (b"WAVE"
            + b"fmt " + _st.pack("<I", len(fmt)) + fmt
            + b"fact" + _st.pack("<II", 4, 1)
            + b"data" + _st.pack("<I", len(block)) + block)
    x, rate = decode_wav(b"RIFF" + _st.pack("<I", len(body)) + body)
    assert rate == 8000 and x.tolist() == [-512 / 32768.0]


def test_adpcm_stereo_block_is_two_independent_machines():
    """Stereo IMA ADPCM: two 4-byte headers + alternating 4-byte
    nibble groups; each channel's decode must equal an independent
    MONO machine fed that channel's codes alone — the interleave is
    byte layout, never shared state."""
    import numpy as np

    from mysql_clickhouse_sync_spark.operators.codecs import (
        _ima_step,
        encode_wav_adpcm_stereo_codes,
        ima_adpcm_decode_stereo_block,
    )

    cl = np.array([(3 + 7 * k) % 16 for k in range(16)], np.uint8)
    cr = np.array([(5 + 3 * k) % 16 for k in range(16)], np.uint8)
    wav = encode_wav_adpcm_stereo_codes(
        (1000, -2000), (5, 12), cl, cr, 16_000
    )
    blk = bytes(wav[wav.index(b"data") + 8:])

    def mono(p, i, codes, n):
        out = [p]
        for c in codes[: n - 1]:
            p, i = _ima_step(p, i, int(c))
            out.append(p)
        return out

    lr = ima_adpcm_decode_stereo_block(blk, 17)
    assert lr.shape == (17, 2)
    assert lr[:, 0].tolist() == mono(1000, 5, cl, 17)
    assert lr[:, 1].tolist() == mono(-2000, 12, cr, 17)


def test_adpcm_stereo_hand_packed_golden_block():
    """Hand-packed stereo block against hand-computed spec values:
    headers L=(100, idx 0), R=(-100, idx 2); left codes 1,8 and right
    codes 4,15 land in the FIRST 4-byte group of each channel (pad
    nibbles 0 beyond n_samples).  Left: step(0)=7 -> code 1: diff =
    7//8 + 7//4 = 0+1, pred 101, idx max(0,0-1)=0; code 8: diff =
    7//8 = 0, pred 101-0=101, idx 0.  Right: step(2)=9 -> code 4:
    diff = 9//8 + 9 = 10, pred -90, idx 2+2=4; step(4)=11 -> code
    15: diff = 11//8+11//4+11//2+11 = 1+2+5+11 = 19, pred -109."""
    import struct as _st

    from mysql_clickhouse_sync_spark.operators.codecs import (
        ima_adpcm_decode_stereo_block,
    )

    hdr = _st.pack("<hBB", 100, 0, 0) + _st.pack("<hBB", -100, 2, 0)
    left = bytes([1 | (8 << 4), 0, 0, 0])
    right = bytes([4 | (15 << 4), 0, 0, 0])
    lr = ima_adpcm_decode_stereo_block(hdr + left + right, 3)
    assert lr[:, 0].tolist() == [100, 101, 101]
    assert lr[:, 1].tolist() == [-100, -90, -109]


def test_adpcm_stereo_container_downmix_and_rejections():
    """decode_wav on a stereo ADPCM container downmixes per-sample
    (L+R)/2 (the PCM-path convention); malformed stereo shapes fail
    with the real cause."""
    import numpy as np
    import pytest as _pt

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_adpcm_stereo_codes,
        ima_adpcm_decode_stereo_block,
    )

    cl = np.arange(8, dtype=np.uint8)
    cr = np.arange(8, dtype=np.uint8)[::-1].copy()
    wav = encode_wav_adpcm_stereo_codes((64, 192), (0, 0), cl, cr, 8000)
    x, rate = decode_wav(wav)
    assert rate == 8000 and len(x) == 9
    blk = bytes(wav[wav.index(b"data") + 8:])
    lr = ima_adpcm_decode_stereo_block(blk, 9)
    want = lr.astype(np.float64).mean(axis=1) / 32768.0
    assert np.array_equal(x, want)
    assert x[0] == (64 + 192) / 2 / 32768.0

    with _pt.raises(ValueError, match="stereo header is 8"):
        ima_adpcm_decode_stereo_block(b"\x00" * 7, 1)
    with _pt.raises(ValueError, match="interleave groups"):
        ima_adpcm_decode_stereo_block(b"\x00" * 8 + b"\x00" * 5, 2)
    with _pt.raises(ValueError, match="channel 1 step index"):
        ima_adpcm_decode_stereo_block(
            b"\x00\x00\x00\x00" + b"\x00\x00\x59\x00", 1
        )
    with _pt.raises(ValueError, match="equal-length"):
        encode_wav_adpcm_stereo_codes((0, 0), (0, 0), [1] * 8, [1] * 16)


def test_adpcm_stereo_truncated_final_block_mono_parity():
    """A stereo block whose code stream is NOT a whole number of
    8-byte interleave groups (foreign encoders truncate; spec ones
    pad) decodes its COMPLETE leading groups — parity with the mono
    path's odd-length-tail tolerance (r10 advice) — and only a
    request beyond them is rejected.  The container path caps the
    final block's sample count the same way."""
    import struct as _st

    import numpy as np
    import pytest as _pt

    from mysql_clickhouse_sync_spark.operators.codecs import (
        decode_wav,
        encode_wav_adpcm_stereo_codes,
        ima_adpcm_decode_stereo_block,
    )

    cl = np.arange(16, dtype=np.uint8) % 16
    cr = (np.arange(16, dtype=np.uint8)[::-1] % 16).copy()
    wav = encode_wav_adpcm_stereo_codes((100, -200), (3, 7), cl, cr, 8000)
    blk = bytes(wav[wav.index(b"data") + 8:])   # 8 hdr + 16 bytes (2 groups)
    full = ima_adpcm_decode_stereo_block(blk, 17)

    # Chop 3 bytes off the final group: only group 0 (8 samples/chan
    # + the header sample) survives, and it matches the full decode.
    trunc = blk[:-3]
    part = ima_adpcm_decode_stereo_block(trunc, 9)
    assert np.array_equal(part, full[:9])
    with _pt.raises(ValueError, match="complete 4-byte interleave"):
        ima_adpcm_decode_stereo_block(trunc, 10)

    # Same truncation through the WAV container: rebuild the file
    # with the short data chunk (block_align still claims the full
    # size — the stream just ends early) and no fact cap; decode_wav
    # must emit exactly the 9 recoverable downmixed samples.
    data_off = wav.index(b"data")
    hdr = bytearray(wav[:data_off])
    body = b"data" + _st.pack("<I", len(trunc)) + trunc
    riff = hdr + body
    _st.pack_into("<I", riff, 4, len(riff) - 8)
    # drop the fact chunk's sample cap if present by keeping it:
    # fact says 17 but only 9 are recoverable -> the cap is a min()
    x, rate = decode_wav(bytes(riff))
    assert rate == 8000
    want = full[:9].astype(np.float64).mean(axis=1) / 32768.0
    assert np.array_equal(x, want)

    # the tolerance is for a truncated FINAL block ONLY: a stereo
    # file whose block_align itself is not whole interleave groups
    # would silently drop bytes from EVERY block — spec-invalid
    # geometry fails loudly at the header (r11 review finding)
    bad = bytearray(wav)
    fmt_off = bad.index(b"fmt ")
    # nBlockAlign lives 12 bytes into the fmt chunk payload
    _st.pack_into("<H", bad, fmt_off + 8 + 12, 28)   # (28-8) % 8 != 0
    with _pt.raises(ValueError, match="not whole 4-byte"):
        decode_wav(bytes(bad))


def test_alaw_golden_codewords_and_round_trip():
    """A-law pinned against hand-computed spec values, and the
    property mu-law lacks: encode(decode(c)) == c for ALL 256
    codewords (A-law has no redundant negative zero)."""
    import numpy as np

    from mysql_clickhouse_sync_spark.operators.codecs import (
        alaw_to_linear,
        linear_to_alaw,
    )

    # hand-computed: code 0x55 -> a=0x00: seg 0, mant 0, sign clear
    # -> -8; code 0xD5 -> a=0x80 -> +8; code 0x2A -> a=0x7F: seg 7,
    # mant 15 -> ((15<<4)+264)<<6 = 32256, sign clear -> -32256;
    # code 0xAA -> a=0xFF -> +32256; code 0x45 -> a=0x10: seg 1,
    # mant 0 -> 264, sign clear -> -264
    got = alaw_to_linear(np.array([0x55, 0xD5, 0x2A, 0xAA, 0x45],
                                  dtype=np.uint8))
    assert got.tolist() == [-8, 8, -32256, 32256, -264]
    all_codes = np.arange(256, dtype=np.uint8)
    dec = alaw_to_linear(all_codes)
    assert int(np.abs(dec).max()) == 32256 and 0 not in dec
    assert np.array_equal(linear_to_alaw(dec), all_codes)


def test_alaw_container_decode_and_bits_guard():
    """A format-6 WAV decodes through the registry codec with the
    /32768 scaling; bits != 8 fails with the real cause."""
    import struct as _st

    import numpy as np

    from mysql_clickhouse_sync_spark.operators.codecs import (
        alaw_to_linear,
        decode_wav,
        encode_wav_alaw,
    )

    x = np.array([0.0, 0.5, -0.25, 0.984375])
    wav = encode_wav_alaw(x, rate=8000)
    out, rate = decode_wav(wav)
    assert rate == 8000 and len(out) == 4
    # the container round trip equals decode(encode-codewords)
    pcm16 = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    from mysql_clickhouse_sync_spark.operators.codecs import (
        linear_to_alaw,
    )

    want = alaw_to_linear(linear_to_alaw(pcm16)) / 32768.0
    assert np.array_equal(out, want)
    bad = bytearray(wav)
    bad[34] = 16                     # bits-per-sample byte inside fmt
    with pytest.raises(ValueError, match="A-law with bits=16"):
        decode_wav(bytes(bad))


def test_adpcm_stereo_production_encoder_round_trip():
    """The production stereo path ((n, 2) input): each channel's
    per-block encode is the SAME mono machine, so the decoded
    downmix equals a manual per-block per-channel replay EXACTLY;
    companding error on smooth content stays bounded like mono;
    block-geometry violations fail with the real cause."""
    import pytest as _pt

    from mysql_clickhouse_sync_spark.operators.codecs import (
        _ima_step,
        decode_wav,
        encode_wav_adpcm,
        ima_adpcm_encode,
    )

    n = 1300
    left = np.sin(np.linspace(0.0, 9.0, n)) * 0.55
    right = np.cos(np.linspace(0.0, 7.0, n)) * 0.4
    x2 = np.stack([left, right], axis=1)
    out, rate = decode_wav(encode_wav_adpcm(x2, rate=16_000,
                                            block_align=64))
    assert rate == 16_000 and len(out) == n
    assert np.abs(out - x2.mean(axis=1)).max() < 0.06

    # bit-exact: decoded downmix == manual per-block two-machine replay
    pcm = np.clip(np.round(x2 * 32768.0), -32768, 32767).astype(np.int64)
    spb = 1 + (64 - 8)
    want = []
    for start in range(0, len(pcm), spb):
        seg = pcm[start : start + spb]
        chans = []
        for ch in range(2):
            pred0, idx0, nib = ima_adpcm_encode(seg[:, ch], idx0=0)
            vals, p, i = [pred0], pred0, idx0
            codes = []
            for b in nib:
                codes += [b & 0xF, b >> 4]
            for c in codes[: len(seg) - 1]:
                p, i = _ima_step(p, i, c)
                vals.append(p)
            chans.append(vals)
        want += [(a + b) / 2 / 32768.0 for a, b in zip(*chans)]
    assert np.array_equal(out, np.array(want))

    with _pt.raises(ValueError, match="interleave groups"):
        encode_wav_adpcm(x2, block_align=60)   # (60-8) % 8 != 0
    with _pt.raises(ValueError, match="mono.*or.*stereo|1-D"):
        encode_wav_adpcm(np.zeros((4, 3)))
