"""Distributed global rank / equal-frequency bucketing
(operators/rank.py): must be bit-identical to the single-partition
``row_number``/``ntile`` windows it replaces, with no SinglePartition
exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql_clickhouse_sync_spark.operators.rank import (
    ntile_from_rank,
    with_equal_freq_bucket,
    with_global_rank,
)


@pytest.fixture(scope="module")
def values(spark):
    # 997 rows (prime: uneven ntile buckets), shuffled insert order,
    # duplicate sort keys broken by the unique id.
    return spark.range(0, 997).select(
        F.col("id"),
        ((F.col("id") * 7919) % 337).alias("v"),
    ).repartition(8)


def test_global_rank_matches_row_number(spark, values):
    order = [F.col("v").desc(), F.col("id")]
    ranked, total = with_global_rank(values, order, "r", num_partitions=8)
    assert total == 997
    expected = values.withColumn(
        "r_exp", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    diff = (
        ranked.join(expected.select("id", "r_exp"), "id")
        .filter(F.col("r") != F.col("r_exp"))
        .count()
    )
    assert diff == 0


@pytest.mark.parametrize("n", [2, 4, 7])
def test_equal_freq_bucket_matches_ntile(spark, values, n):
    order = [F.col("v").desc(), F.col("id")]
    got = with_equal_freq_bucket(values, order, "b", n, num_partitions=8)
    expected = values.withColumn(
        "b_exp", F.ntile(n).over(Window.orderBy(*order))
    )
    diff = (
        got.join(expected.select("id", "b_exp"), "id")
        .filter(F.col("b") != F.col("b_exp"))
        .count()
    )
    assert diff == 0


def test_ntile_formula_tiny_relation(spark):
    # fewer rows than buckets: bucket i = row i (SQL NTILE semantics)
    df = spark.range(1, 4).select(F.col("id"))
    got = with_equal_freq_bucket(df, [F.col("id")], "b", 7, num_partitions=2)
    rows = {r.id: r.b for r in got.collect()}
    assert rows == {1: 1, 2: 2, 3: 3}


def test_plan_has_no_single_partition(spark, values):
    ranked, _ = with_global_rank(
        values, [F.col("v"), F.col("id")], "r", num_partitions=8
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_ntile_from_rank_exact_sizes():
    # 10 rows, 4 buckets -> sizes 3,3,2,2
    import collections

    sizes = collections.Counter(
        # evaluated via the formula's python twin
        (lambda q, r, rank: (
            -(-rank // (q + 1))
            if rank <= r * (q + 1)
            else r + -(-(rank - r * (q + 1)) // q)
        ))(2, 2, rank)
        for rank in range(1, 11)
    )
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}


def test_ntile_from_rank_column(spark):
    df = spark.range(1, 11).select(F.col("id").alias("rank"))
    got = {
        r.rank: r.b
        for r in df.select(
            "rank", ntile_from_rank(F.col("rank"), 10, 4).alias("b")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3, 8: 3, 9: 4, 10: 4}


def test_equal_freq_bucket_property(spark):
    """Property sweep: for random sizes/buckets/partition counts the
    distributed bucketing equals the ntile window bit-for-bit."""
    import random

    rng = random.Random(7)
    for _ in range(5):
        n_rows = rng.randrange(1, 400)
        n_buckets = rng.choice([2, 3, 4, 5, 8])
        parts = rng.choice([1, 3, 8])
        df = spark.range(0, n_rows).select(
            F.col("id"), ((F.col("id") * 131) % 59).alias("v")
        ).repartition(4)
        order = [F.col("v"), F.col("id").desc()]
        got = with_equal_freq_bucket(
            df, order, "b", n_buckets, num_partitions=parts
        )
        exp = df.withColumn(
            "b_exp", F.ntile(n_buckets).over(Window.orderBy(*order))
        )
        diff = (
            got.join(exp.select("id", "b_exp"), "id")
            .filter(F.col("b") != F.col("b_exp"))
            .count()
        )
        assert diff == 0, (n_rows, n_buckets, parts)


def test_global_rank_broadcast_join_path_matches(spark, values, monkeypatch):
    """Beyond _MAX_OFFSET_LITERALS partitions the offset lookup
    switches from an array-literal index to a broadcast join; both
    strategies must produce identical ranks (round-3 advice: the old
    map-literal lookup paid O(num_partitions) per row)."""
    import mysql_clickhouse_sync_spark.operators.rank as rank_mod

    order = [F.col("v"), F.col("id")]
    expected = [
        r["global_rank"]
        for r in sorted(
            with_global_rank(values, order, num_partitions=7)[0].collect(),
            key=lambda r: r["id"],
        )
    ]
    monkeypatch.setattr(rank_mod, "_MAX_OFFSET_LITERALS", 0)
    via_join, total = with_global_rank(values, order, num_partitions=7)
    got = [
        r["global_rank"]
        for r in sorted(via_join.collect(), key=lambda r: r["id"])
    ]
    assert got == expected
    assert total == 997


def test_single_partition_fast_path_matches_general(spark, values):
    """num_partitions == 1 + known_total takes the zero-extra-job fast
    path (no checkpoint, no offsets collect); ranks and buckets must be
    bit-identical to both the general path and the ntile window."""
    order = [F.col("v").desc(), F.col("id")]
    ranked, total = with_global_rank(
        values, order, "r", num_partitions=1, known_total=997
    )
    assert total == 997
    expected = values.withColumn(
        "r_exp", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    diff = (
        ranked.join(expected.select("id", "r_exp"), "id")
        .filter(F.col("r") != F.col("r_exp"))
        .count()
    )
    assert diff == 0
    got = with_equal_freq_bucket(
        values, order, "b", 4, num_partitions=1, known_total=997
    )
    exp_b = values.withColumn(
        "b_exp", F.ntile(4).over(Window.orderBy(*order))
    )
    diff_b = (
        got.join(exp_b.select("id", "b_exp"), "id")
        .filter(F.col("b") != F.col("b_exp"))
        .count()
    )
    assert diff_b == 0


def test_single_partition_fast_path_plan_has_no_barrier(spark, values):
    """The fast path's plan must contain neither a checkpointed RDD
    scan (ExistingRDD) nor a Window — one range exchange, nothing
    else; and the general path still runs when num_partitions > 1
    even with known_total supplied."""
    order = [F.col("v").desc(), F.col("id")]
    ranked, _ = with_global_rank(
        values, order, "r", num_partitions=1, known_total=997
    )
    plan = ranked._sc._jvm.PythonSQLUtils.explainString(
        ranked._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" not in plan, plan
    assert "Window" not in plan, plan
    general, _ = with_global_rank(
        values, order, "r", num_partitions=2, known_total=997
    )
    gplan = general._sc._jvm.PythonSQLUtils.explainString(
        general._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" in gplan, gplan
