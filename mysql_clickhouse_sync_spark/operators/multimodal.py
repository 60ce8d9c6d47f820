"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns travelling next
to typed metadata (SURVEY.md north star; the reference itself maps all
MySQL BLOB types to an opaque type, ``/root/reference/src/
schema_converter.py:24-36`` — here we keep them ``BinaryType`` and
make them useful).

Execution model: decode / feature-extract / resize / frame-sample run
as **Arrow-batched ``mapInPandas``** stages — the one place in this
engine where Python is the right tool, because codec work is
per-payload CPU-bound native-library territory, not relational
algebra.  The Spark-side contract is what matters at 100 TB:

* explicit output schemas (no inference) so stages compose;
* ``spread()`` before the map so codec work uses every core even when
  the upstream scan has few splits;
* batch-shaped iteration (``Iterator[pd.DataFrame]``) so Arrow
  transfer amortizes per-batch, never per-row;
* payload bytes stay in executors — nothing collects to the driver.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernel is STUBBED: ``decode_kind='fake'`` produces a
deterministic synthetic decode from the payload bytes (tests use it),
and ``decode_kind='real'`` raises ``NotImplementedError`` at the point
where a deployment would call the codec.  Everything around the stub —
schemas, partitioning, UDF signatures, batch shapes — is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..util import spread

if TYPE_CHECKING:  # pandas imported lazily inside the UDFs
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),    # images/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),  # audio/video
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), True),
    ]
)

_FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic synthetic 'decode': a 16-dim feature derived from
    the payload digest.  Stands in for codec+model inference so the
    distributed plumbing is testable without media libraries."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


def decode_and_featurize(
    df: DataFrame, decode_kind: str = "fake"
) -> DataFrame:
    """binary payload -> (hash, size, feature vector) via mapInPandas.

    One Arrow-batched pass; output drops the payload so downstream
    stages shuffle features (64 B), not media (MBs) — at 100 TB the
    payload column must never cross a shuffle boundary.
    """
    if decode_kind not in ("fake", "real"):
        raise ValueError(f"unknown decode_kind: {decode_kind}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if decode_kind == "real":
                # Deployment point: PIL.Image.open / soundfile.read /
                # av.open on pdf["payload"] — libs absent in this
                # container.
                raise NotImplementedError(
                    "real media codecs not available; use decode_kind='fake'"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(_fake_decode),
                }
            )

    return spread(df).mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, decode_kind: str = "fake"
) -> DataFrame:
    """Image resize stage.  Fake kernel: passes payload through and
    stamps the target geometry (a real deployment decodes, resamples,
    re-encodes inside the same batch loop)."""
    if decode_kind not in ("fake", "real"):
        raise ValueError(f"unknown decode_kind: {decode_kind}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if decode_kind == "real":
                raise NotImplementedError("image codec not available")
            out = pdf[pdf["kind"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "payload": out["payload"],
                }
            )

    return spread(df).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode_kind: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a
    1:N ``mapInPandas``, the shape a real demuxer needs).  Fake kernel
    emits deterministic frame stubs at the requested cadence based on
    ``duration_ms``."""
    if decode_kind not in ("fake", "real"):
        raise ValueError(f"unknown decode_kind: {decode_kind}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if decode_kind == "real":
                raise NotImplementedError("video demuxer not available")
            vids = pdf[pdf["kind"] == "video"]
            rows = []
            for _, r in vids.iterrows():
                dur = int(r["duration_ms"] or 0)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame": (r["payload"] or b"") + i.to_bytes(4, "big"),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    return spread(df).mapInPandas(run, FRAMES_SCHEMA)


def media_dedup_keys(df: DataFrame) -> DataFrame:
    """Exact-dup key for media: content hash of the payload, computed
    JVM-side (no Python) — ``sha2`` over the binary column.  Pairs with
    exact_dedup's groupBy pattern for petabyte media corpora."""
    return df.select(
        "media_id",
        "kind",
        F.sha2(F.col("payload"), 256).alias("content_sha256"),
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos (payload bytes
    derived from the id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i // 2}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                3500 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
