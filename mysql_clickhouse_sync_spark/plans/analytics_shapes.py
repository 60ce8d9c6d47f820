"""Remaining relational shapes: pivot, cube, exact percentiles, and
deterministic stratified sampling.

Training-data pipelines lean on the sampler (per-stratum rates without
``rand()`` — content/id-derived so re-runs and retried tasks pick the
same rows) and percentile profiling; pivot/cube round out the grouping
surface next to analytics.py's ROLLUP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_type_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY date_trunc('day', ts)
    """,
    description="Pivot (long->wide) with an explicit value list — no "
    "extra distinct-values job, single aggregation pass",
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot leaves null for absent combos; the oracle's FILTER gives 0
    return out.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    description="Exact interpolated percentiles (sort-based; the "
    "approx_percentile sketch is the 100 TB path, exact is the oracle)",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.count("*").alias("n"),
    )


@register(
    "lineitem_cube_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="CUBE grouping sets (all 2^k subtotal combinations in "
    "one pass) — completes the rollup/cube/pivot grouping surface",
)
def lineitem_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "docs_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE (lang = 'en' AND doc_id % 2 = 0)
       OR (lang <> 'en' AND doc_id % 5 = 0)
    """,
    description="Deterministic stratified sampling (50% en, 20% rest) "
    "keyed on the id, not rand() — retried tasks and re-runs select "
    "identical rows, the property a training-data pipeline needs",
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keep = F.when(
        F.col("lang") == "en", F.col("doc_id") % 2 == 0
    ).otherwise(F.col("doc_id") % 5 == 0)
    return docs.filter(keep).select("doc_id", "lang", "source")


@register(
    "orders_in_promo_windows",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS promo_value
    FROM orders
    WHERE EXTRACT(month FROM o_orderdate) >= 10
    GROUP BY EXTRACT(year FROM o_orderdate)
    """,
    description="Range join (bucket-chunked point-in-interval, the "
    "equi-join rewrite of the theta join Spark would nested-loop): "
    "orders matched into derived Q4 promo windows",
)
def orders_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join

    orders = load_table(spark, sf_dir, "orders")
    points = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("p_us"),
    )
    windows = (
        orders.select(F.year("o_orderdate").alias("yr"))
        .distinct()
        .select(
            "yr",
            F.unix_micros(
                F.to_timestamp(F.format_string("%d-10-01", F.col("yr")))
            ).alias("s_us"),
            F.unix_micros(
                F.to_timestamp(F.format_string("%d-01-01", F.col("yr") + 1))
            ).alias("e_us"),
        )
    )
    month_us = 30 * 24 * 3600 * 1_000_000
    matched = range_join(
        points, windows, "p_us", "s_us", "e_us", bucket_width=month_us
    )
    return matched.groupBy("yr").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("promo_value"),
    )


@register(
    "orders_value_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bin_low,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS bin_value
    FROM orders
    GROUP BY floor(o_totalprice / 50000)
    """,
    description="Fixed-width histogram binning (floor-division bucket "
    "keys; one partial-aggregated pass, no sort)",
)
def orders_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000)
    return (
        orders.groupBy(bin_col.alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("bin_value"),
        )
        .select(
            "bin",
            (F.col("bin") * 50000).cast("double").alias("bin_low"),
            "n_orders",
            "bin_value",
        )
    )


@register(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                AS BIGINT) AS days_since_prev,
           CAST(date_diff('day', o_orderdate, lead(o_orderdate) OVER w)
                AS BIGINT) AS days_until_next,
           CAST(row_number() OVER w AS INT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="Order-gap analysis: lag + lead + row_number sharing "
    "ONE window spec — a single PK shuffle serves all three",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_d = F.lag("o_orderdate").over(w)
    next_d = F.lead("o_orderdate").over(w)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev_d).cast("long")
        .alias("days_since_prev"),
        F.datediff(next_d, F.col("o_orderdate")).cast("long")
        .alias("days_until_next"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


@register(
    "docs_weighted_sample",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               ln(((doc_id * 2654435761) % 4294967296 + 1)
                  / 4294967297.0) / n_chars AS _es_key
        FROM documents
    )
    ORDER BY _es_key DESC, doc_id
    LIMIT 100
    """,
    description="Weighted sampling without replacement "
    "(Efraimidis-Spirakis, inclusion probability ~ n_chars): "
    "deterministic arithmetic-hash randomness, so retries, re-runs, "
    "and the oracle select IDENTICAL rows; global top-k, no shuffle",
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample(docs, "n_chars", k=100)
