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


def _file_coverage(path: str, col: str) -> float:
    """Mean fraction of the column's global range each parquet file's
    min/max envelope covers (via pyarrow footer stats, the same stats
    Spark's parquet reader prunes row groups with)."""
    import glob

    import pyarrow.parquet as pq

    spans, lo_g, hi_g = [], None, None
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
        lo_g = lo if lo_g is None else min(lo_g, lo)
        hi_g = hi if hi_g is None else max(hi_g, hi)
    assert spans and hi_g > lo_g
    return sum((hi - lo) for lo, hi in spans) / len(spans) / (hi_g - lo_g)


def test_zorder_morton_locality(spark, tmp_path):
    """Z-ordered layout must give NARROW per-file envelopes on BOTH
    interleaved dimensions (a plain sort clusters only its leading
    key), so min/max stats prune filters on either column; and the
    rewrite is a pure re-layout (same rows)."""
    from mysql_clickhouse_sync_spark.pipeline.layout import write_zordered

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "ev_z")
    write_zordered(ev, path, ["user_id", "value"], n_files=16)

    cov_user = _file_coverage(path, "user_id")
    cov_value = _file_coverage(path, "value")
    assert cov_user < 0.5, f"user_id envelope too wide: {cov_user:.2f}"
    assert cov_value < 0.5, f"value envelope too wide: {cov_value:.2f}"

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.columns == ev.columns  # _z dropped
    # layout change only: same multiset of rows
    assert (
        back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    )


def test_morton_code_is_monotone_per_dimension(spark):
    """Fixing one dimension, the morton key must be monotone in the
    other (bit interleaving sanity)."""
    from mysql_clickhouse_sync_spark.pipeline.layout import morton_code

    df = spark.range(0, 1000).select(
        F.col("id").cast("double").alias("x"), F.lit(7.0).alias("y")
    )
    z = df.select(
        "x",
        morton_code([(F.col("x"), 0.0, 999.0), (F.col("y"), 0.0, 999.0)])
        .alias("z"),
    )
    rows = z.orderBy("x").collect()
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs)
