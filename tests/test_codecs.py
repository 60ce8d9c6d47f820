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
    assert isinstance(image_codec_for("image/bmp"), BmpImageCodec)
    assert image_codec_for("image/png") is None
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

    png = spark.createDataFrame(
        [(8, "image", "image/png", bytearray(b"x"), 1, 1, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no image codec registered"):
        decode_and_featurize(png, decode_kind="real").collect()


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

    class FakePngCodec:
        """Pretends every payload is a 2x1 image whose first pixel is
        the payload's first byte."""

        def decode(self, payload):
            b = payload[0] if payload else 0
            return np.array([[[b, 0, 0], [0, 0, 0]]], dtype=np.uint8)

        def encode(self, rgb):
            return bytes([int(rgb[0, 0, 0])])

    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(b"\x2a"), 2, 1, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no image codec registered"):
        image_stats(media).collect()

    # scoped registration: the context manager restores prior state
    # (absence here) on exit, so the test never touches private dicts
    with codecs.temporary_codec("image", "image/png", FakePngCodec()):
        row = image_stats(media).collect()[0]
        assert (row["width"], row["height"]) == (2, 1)
        assert row["r00"] == 0x2A and row["r_last"] == 0
    with pytest.raises(Exception, match="no image codec registered"):
        image_stats(media).collect()
