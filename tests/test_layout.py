"""Partitioned-write layout: a filter on the partition column must
prune at plan time (PartitionFilters), not scan-and-discard."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from mysql_clickhouse_sync_spark.pipeline.layout import write_clustered
from mysql_clickhouse_sync_spark.sources.parquet import load_table


def test_partition_pruning_on_date(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_clustered(ev, path, partition_cols=["day"], sort_cols=["user_id", "ts"])

    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(day" in plan or "day" in plan.split("PartitionFilters:")[1].split("]")[0]
    # correctness: partition column round-trips
    n_direct = ev.filter(F.col("day") == "2024-01-03").count()
    assert one_day.count() == n_direct > 0


def test_clustered_files_bounded(spark, tmp_path):
    """repartition-by-partition-col keeps one file per partition value
    instead of files x tasks (tiny-file guard)."""
    import glob

    path = str(tmp_path / "ev2")
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    write_clustered(ev, path, partition_cols=["day"], sort_cols=["ts"])
    days = glob.glob(path + "/day=*")
    assert days, "no partition directories"
    for d in days:
        files = [f for f in glob.glob(d + "/*") if f.endswith(".parquet")]
        assert len(files) <= 2, f"{d}: {len(files)} files"


def test_bucketed_join_has_no_exchange(spark):
    """Same-key same-count bucketed tables must join with zero
    shuffles (the write-once, join-many layout)."""
    from mysql_clickhouse_sync_spark.pipeline.layout import write_bucketed

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
