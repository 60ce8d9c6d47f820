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


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "a"),   # next right at 130 -> gap 30
            (1, 130, "eq"),  # equal ts matches forward too
            (1, 500, "late"),  # no right at or after
            (2, 100, "far"),   # next right at 400 -> gap 300
        ],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 130, 7.0), (1, 90, 1.0), (2, 400, 9.0)],
        "k long, ts long, v double",
    )
    fwd = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], direction="forward"
        ).collect()
    }
    assert fwd == {"a": 7.0, "eq": 7.0, "late": None, "far": 9.0}
    # tolerance nulls matches farther than the bound (forward gap 300 > 50)
    tol = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"],
            direction="forward", tolerance=50,
        ).collect()
    }
    assert tol == {"a": 7.0, "eq": 7.0, "late": None, "far": None}


def test_asof_forward_is_mirror_of_backward(spark):
    """Exact mirror identity: forward(ts) == backward(-ts) — holds for
    every row including ties, so the two directions share one
    correctness argument."""
    import pyspark.sql.functions as F

    left = spark.range(0, 300).select(
        (F.col("id") % 3).alias("k"),
        (F.xxhash64("id") % 1000).alias("ts"),
        F.col("id").alias("tag"),
    )
    right = spark.range(0, 150).select(
        (F.col("id") % 3).alias("k"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("ts"),
        (F.col("id") * 1.5).alias("v"),
    )
    fwd = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    direction="forward")
    neg_l = left.withColumn("ts", -F.col("ts"))
    neg_r = right.withColumn("ts", -F.col("ts"))
    bwd = asof_join(neg_l, neg_r, ["k"], "ts", "ts", ["v"])
    got = sorted((r.tag, r.v_asof) for r in fwd.collect())
    want = sorted((r.tag, r.v_asof) for r in bwd.collect())
    assert got == want


def test_asof_backward_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, "near"), (1, 1000, "stale")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame([(1, 90, 5.0)], "k long, ts long, v double")
    out = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], tolerance=60
        ).collect()
    }
    assert out == {"near": 5.0, "stale": None}  # gap 910 > 60
