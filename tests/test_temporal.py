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


def test_range_join_matches_naive(spark):
    from mysql_clickhouse_sync_spark.operators.temporal import range_join
    import pyspark.sql.functions as F

    points = spark.range(0, 200).selectExpr("id as p")
    intervals = spark.createDataFrame(
        [(0, 10, "a"), (5, 50, "b"), (100, 101, "c"), (150, 300, "d"),
         (42, 42, "empty")],
        "s long, e long, name string",
    )
    fast = range_join(points, intervals, "p", "s", "e", bucket_width=16)
    naive = points.crossJoin(intervals).filter(
        (F.col("s") <= F.col("p")) & (F.col("p") < F.col("e"))
    )
    assert sorted(map(tuple, fast.select("p", "name").collect())) == sorted(
        map(tuple, naive.select("p", "name").collect())
    )


def test_range_join_left_keeps_unmatched_points(spark):
    from mysql_clickhouse_sync_spark.operators.temporal import range_join

    points = spark.range(0, 10).selectExpr("id as p")
    intervals = spark.createDataFrame([(2, 4, "x")], "s long, e long, nm string")
    out = range_join(points, intervals, "p", "s", "e", 8, how="left")
    assert out.count() == 10
    got = {r.p: r.nm for r in out.collect()}
    assert got[2] == "x" and got[3] == "x" and got[5] is None
