"""User-behavior analytics: funnel, retention cohorts, gap-filled
time series, grouping-sets summaries.

The reference exposes its replicated tables to exactly this kind of
downstream analytics SQL (``/root/reference/README.md:435-449``); these
queries are the canonical event-warehouse shapes a ClickHouse user
would run on the ``events`` stream, re-expressed Spark-first.

Scale notes (100 TB posture):

* ``events_funnel`` is ONE shuffle — per-user event arrays folded with
  higher-order functions instead of the classic 3-way self-join (which
  would shuffle the events table three times).
* ``events_retention_cohorts`` is two shuffles (user rollup, cohort
  rollup) with no join: the per-user week set is collected once and
  exploded, instead of joining a firsts table back onto activity.
* ``events_hourly_gapfill`` builds the dense calendar grid from ONE
  aggregated row (sequence+explode) and joins only the pre-aggregated
  counts — the raw table is touched once; the dense grid (types x
  hours) stays tiny no matter how large the raw data.
* ``lineitem_grouping_sets`` shares one scan and one exchange across
  all three grouping sets (Catalyst Expand), instead of a UNION ALL of
  three separate aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "events_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ), clicks AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN per_user u ON e.user_id = u.user_id
        WHERE e.event_type = 'click' AND e.ts >= u.t_view
        GROUP BY e.user_id
    ), purchases AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN clicks c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    )
    SELECT
        CAST((SELECT count(t_view) FROM per_user) AS BIGINT) AS n_view,
        CAST((SELECT count(*) FROM clicks) AS BIGINT) AS n_view_click,
        CAST((SELECT count(*) FROM purchases) AS BIGINT)
            AS n_view_click_purchase,
        CAST((SELECT count(*) FROM clicks) AS DOUBLE)
            / (SELECT count(t_view) FROM per_user) AS click_rate,
        CAST((SELECT count(*) FROM purchases) AS DOUBLE)
            / (SELECT count(*) FROM clicks) AS purchase_rate
    """,
    description="Ordered view->click->purchase funnel in ONE shuffle: "
    "per-user event arrays + higher-order functions replace the "
    "3-way self-join the oracle runs",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.collect_list(F.struct("ts", "event_type")).alias("evs"),
    )
    # Stage timestamps fold over the collected array; each lambda
    # captures the previous stage's column (outer-reference HOF).
    t_click = F.array_min(
        F.transform(
            F.filter(
                F.col("evs"),
                lambda e: (e.event_type == "click")
                & (e.ts >= F.col("t_view")),
            ),
            lambda e: e.ts,
        )
    )
    staged = per_user.withColumn("t_click", t_click).withColumn(
        "t_purchase",
        F.array_min(
            F.transform(
                F.filter(
                    F.col("evs"),
                    lambda e: (e.event_type == "purchase")
                    & (e.ts >= F.col("t_click")),
                ),
                lambda e: e.ts,
            )
        ),
    )
    return staged.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    ).select(
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        (
            F.col("n_view_click").cast("double") / F.col("n_view")
        ).alias("click_rate"),
        (
            F.col("n_view_click_purchase").cast("double")
            / F.col("n_view_click")
        ).alias("purchase_rate"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
    description="Cohort retention matrix (first-seen week x week "
    "offset -> active users) with no join: per-user week set collected "
    "once and exploded, vs the oracle's firsts-to-activity join",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    per_user = (
        ev.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(
            F.min("week").alias("cohort_week"),
            F.collect_set("week").alias("weeks"),
        )
    )
    exploded = per_user.select(
        "cohort_week", F.explode("weeks").alias("active_week")
    )
    return exploded.groupBy(
        "cohort_week",
        (
            F.datediff(F.col("active_week"), F.col("cohort_week"))
            / F.lit(7)
        )
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT min(date_trunc('hour', ts)) AS h0,
               max(date_trunc('hour', ts)) AS h1
        FROM events
    ), grid AS (
        SELECT t.event_type,
               unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds b
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ), counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT g.event_type, CAST(g.hour AS TIMESTAMP) AS hour,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid g
    LEFT JOIN counts c ON c.event_type = g.event_type AND c.hour = g.hour
    """,
    description="Gap-filled hourly series (timeseries densification): "
    "dense calendar grid from sequence+explode of ONE aggregated "
    "bounds row, left-joined onto pre-aggregated counts — the raw "
    "table is scanned once; grid size is types x hours regardless of "
    "data volume",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    types = ev.select("event_type").distinct()
    grid = (
        bounds.select(
            F.explode(
                F.sequence(
                    F.col("h0"), F.col("h1"), F.expr("interval 1 hour")
                )
            ).alias("hour")
        )
        .crossJoin(F.broadcast(types))
    )
    counts = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count("*").alias("n")
    )
    return (
        grid.join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@register(
    "lineitem_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    description="GROUPING SETS (detail, subtotal, grand total) in one "
    "scan + one Expand exchange — vs a UNION ALL of three aggregations "
    "that would read the fact table three times",
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "events_daily_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), stats AS (
        SELECT event_type,
               count(*) AS n_days,
               SUM(n) AS sum_n,
               SUM(n * n) AS sum_n2
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           round(
               (d.n - CAST(s.sum_n AS DOUBLE) / s.n_days)
               / sqrt((s.n_days * s.sum_n2 - s.sum_n * s.sum_n)
                      / (CAST(s.n_days AS DOUBLE) * (s.n_days - 1))),
               6
           ) AS zscore
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    """,
    description="Daily volume anomaly z-scores per event type: "
    "variance from EXACT integer sums (n*sum_sq - sum^2 form), so the "
    "result is order-independent where a naive stddev over doubles "
    "would flap with partition order; one double division + sqrt at "
    "the end, rounded vs libm",
)
def events_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("sum_n").cast("double") / F.col("n_days")
    var = (
        F.col("n_days") * F.col("sum_n2") - F.col("sum_n") * F.col("sum_n")
    ) / (F.col("n_days").cast("double") * (F.col("n_days") - F.lit(1)))
    return j.select(
        "event_type",
        "day",
        "n",
        F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("zscore"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey)
                AS INT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                AS INT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                AS INT) AS m_quartile
    FROM rfm
    """,
    description="RFM customer segmentation: recency/frequency/monetary "
    "quartiles with fully-pinned ordering; exact decimal monetary.  "
    "The oracle keeps the ntile form; the Spark plan computes the SAME "
    "buckets with zero SinglePartition exchange — each quartile is a "
    "range-partitioned global rank (operators/rank.py, the "
    "zipWithIndex pattern) fed into the closed-form NTILE formula, so "
    "every window is partition-local and the plan scales to billions "
    "of customers (asserted in tests/test_plans.py)",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import partitions_for, with_equal_freq_bucket

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("monetary"),
    )
    # Size the three range shuffles to the per-customer relation (one
    # cheap agg-count job) so harness-scale inputs pay harness-scale
    # jobs while billions of customers fan out across the cluster.
    # The count doubles as known_total: at num_partitions == 1 each
    # bucketing takes the zero-extra-job fast path (no checkpoint, no
    # offsets collect — 6 driver barriers gone per run at harness
    # scale; > 1M customers still fan out through the general path).
    n = rfm.count()
    p = partitions_for(n)
    out = with_equal_freq_bucket(
        rfm, [F.col("last_order").desc(), F.col("o_custkey")],
        "r_quartile", 4, num_partitions=p, known_total=n,
    )
    out = with_equal_freq_bucket(
        out, [F.col("frequency").desc(), F.col("o_custkey")],
        "f_quartile", 4, num_partitions=p, known_total=n,
    )
    out = with_equal_freq_bucket(
        out, [F.col("monetary").desc(), F.col("o_custkey")],
        "m_quartile", 4, num_partitions=p, known_total=n,
    )
    return out.select(
        "o_custkey", "last_order", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile",
    )
