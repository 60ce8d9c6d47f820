"""salted_join / two_phase_agg must be exactly equivalent to their
unsalted forms — salting changes the shuffle layout, never the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from mysql_clickhouse_sync_spark.operators.skew import salted_join, two_phase_agg
from mysql_clickhouse_sync_spark.sources.parquet import load_table


def test_salted_join_matches_plain_inner(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, ["l_orderkey"]).groupBy("o_orderstatus").count()
    salted = (
        salted_join(li, orders, ["l_orderkey"], n_salts=8)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey")
    big = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice") > 450000
    ).select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    plain = cust.join(big, ["c_custkey"], "left").count()
    salted = salted_join(cust, big, ["c_custkey"], n_salts=4, how="left").count()
    assert plain == salted


def test_two_phase_agg_matches_direct(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    direct = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    salted = two_phase_agg(
        li,
        ["l_returnflag"],
        partial_aggs={
            "s_p": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
            "n_p": F.count("*"),
        },
        final_aggs={"s": F.sum("s_p"), "n": F.sum("n_p")},
        n_salts=8,
    )
    d = {r.l_returnflag: (r.s, r.n) for r in direct.collect()}
    s = {r.l_returnflag: (r.s, r.n) for r in salted.collect()}
    assert d == s
