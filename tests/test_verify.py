"""Verification operator tests (count / diff / checksum — A2 and its
stronger siblings, SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import Row

from mysql_clickhouse_sync_spark.operators.verify import (
    table_checksum,
    verify_counts,
    verify_diff,
)


def _t(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, v=v) for i, v in rows], "id long, v string"
    )


def test_verify_counts_match(spark):
    a = _t(spark, [(1, "a"), (2, "b")])
    b = _t(spark, [(1, "a"), (2, "b")])
    assert verify_counts(a, b)["success"] is True


def test_verify_counts_mismatch(spark):
    # parity: count-mismatch -> failure
    # (/root/reference/tests/test_replicator.py:93-125)
    a = _t(spark, [(1, "a"), (2, "b")])
    b = _t(spark, [(1, "a")])
    out = verify_counts(a, b)
    assert out["success"] is False
    assert (out["source_count"], out["target_count"]) == (2, 1)


def test_verify_diff_detects_both_directions(spark):
    src = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    tgt = _t(spark, [(2, "b"), (3, "c"), (4, "d")])
    out = verify_diff(src, tgt, ["id"])
    assert out == {"missing_in_target": 1, "extra_in_target": 1,
                   "success": False}


def test_checksum_order_insensitive_and_content_sensitive(spark):
    a = _t(spark, [(1, "a"), (2, "b")])
    b = _t(spark, [(2, "b"), (1, "a")])
    c = _t(spark, [(1, "a"), (2, "X")])
    assert table_checksum(a) == table_checksum(b)
    assert table_checksum(a) != table_checksum(c)
