"""asof_join semantics: backward inclusive match, atomic payload,
left rows without a prior right row keep nulls."""

from __future__ import annotations

from datetime import datetime

from mysql_clickhouse_sync_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (1, _ts("2024-01-01 09:00:00"), "early"),
            (2, _ts("2024-01-01 10:30:00"), "other-key"),
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0, None),
            (1, _ts("2024-01-01 12:00:00"), 200.0, "x"),  # equal ts: matches
            (3, _ts("2024-01-01 00:00:00"), 999.0, "z"),
        ],
        "k long, ts timestamp, price double, note string",
    )
    out = {
        (r.tag): (r.price_asof, r.note_asof)
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["price", "note"]
        ).collect()
    }
    assert out["early"] == (None, None)          # nothing at or before
    assert out["a"] == (100.0, None)             # atomic payload: note stays None
    assert out["b"] == (200.0, "x")              # inclusive at equality
    assert out["other-key"] == (None, None)      # key isolation


def test_asof_row_count_preserved(spark):
    left = spark.range(10).selectExpr(
        "id as k", "timestamp'2024-01-01 10:00:00' as ts"
    )
    right = spark.range(3).selectExpr(
        "id as k", "timestamp'2024-01-01 09:00:00' as ts", "id * 1.0 as v"
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    assert out.count() == 10
    matched = {r.k: r.v_asof for r in out.collect()}
    assert matched[0] == 0.0 and matched[2] == 2.0 and matched[5] is None
