"""Event-stream analytics over the ``events`` table (batch view of the
stream the reference's CDC path would process; SURVEY.md §2.9).

Time bucketing, sessionization (stateful logic expressed as windows —
the batch twin of the streaming path in streaming/cdc_pipeline.py),
share-of-total, and deterministic top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_SESSION_GAP_US = 1800 * 1_000_000  # 30 min


@register(
    "events_daily_type_stats",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
    description="Tumbling daily window aggregate (batch twin of a "
    "streaming windowed agg)",
)
def events_daily_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "events_sessionization",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > {_SESSION_GAP_US}
                    OR lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM gaps GROUP BY user_id
    """,
    description="Sessionization (30-min gap) via lag window — the "
    "session-window operator expressed relationally",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is NTZ; unix_micros needs an instant — the session-TZ offset
    # introduced by the cast cancels in the lag difference below.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = (
        F.when(prev.isNull() | (us - prev > _SESSION_GAP_US), 1).otherwise(0)
    )
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_type_share",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM events) AS share
    FROM events GROUP BY event_type
    """,
    description="Share-of-total (global aggregate broadcast back)",
)
def events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return counts.select(
        "event_type",
        "n_events",
        (
            F.col("n_events").cast("double")
            / F.sum("n_events").over(Window.partitionBy())
        ).alias("share"),
    )


@register(
    "events_top_users",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 15
    """,
    description="Filtered deterministic top-k by exact decimal spend",
)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(15)
    )


@register(
    "events_hourly_windows",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    description="Tumbling 1-hour window via F.window (the streaming "
    "window operator itself, exercised in batch)",
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@register(
    "events_sliding_windows",
    oracle="""
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM (
        SELECT CAST(date_trunc('hour', ts)
                    - (o.off * INTERVAL 1 HOUR) AS TIMESTAMP) AS window_start,
               user_id
        FROM events CROSS JOIN (VALUES (0), (1)) AS o(off)
    ) assigned
    GROUP BY window_start
    """,
    description="Sliding 2h/1h window via F.window — each event lands "
    "in two overlapping buckets (streaming hop semantics in batch)",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )


@register(
    "events_last_purchase_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           p.ts AS purchase_ts, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
    ASOF LEFT JOIN (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    description="As-of join (single-shuffle union+window formulation "
    "of the operator Spark lacks) vs DuckDB's native ASOF JOIN: each "
    "event annotated with the user's latest prior purchase",
)
def events_last_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        left, right, ["user_id"], "ts", "ts", ["ts", "value"]
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


@register(
    "events_incremental_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
               AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    description="Hypertable-style continuous rollup: two disjoint "
    "increments of mergeable partial state (count/sum/min/max) merged "
    "then read — must equal the one-shot GROUP BY the oracle runs",
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import rollup_increment, rollup_merge, rollup_read

    ev = load_table(spark, sf_dir, "events")
    # Two refresh cycles: an initial slice and a later slice (split on
    # event_id parity so both touch every bucket — the hard case where
    # merge must combine, not just append).
    first = rollup_increment(ev.filter(F.col("event_id") % 2 == 0))
    second = rollup_increment(ev.filter(F.col("event_id") % 2 == 1))
    return rollup_read(rollup_merge(first, second))


@register(
    "events_user_count_sketch",
    oracle="""
    WITH totals AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ), top AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
        ORDER BY n_purchases DESC, user_id
        LIMIT 15
    )
    SELECT top.user_id, top.n_purchases, t.n_events,
           TRUE AS within_bound
    FROM top JOIN totals t USING (user_id)
    """,
    description="Count-min sketch (depth 4 x width 1024): mergeable "
    "frequency sketch as a relation, probed for the purchase top-15 "
    "users.  The CMS error contract IS the oracle check: the query "
    "emits within_bound = (exact <= est <= exact + ceil(e/width * N)) "
    "per key; the DuckDB twin emits the exact counts with literal "
    "TRUE, so the hash matches iff the one-sided CMS guarantee and "
    "the epsilon overestimate bound both hold",
)
def events_user_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.sketch import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    # literal epsilon bound: width=1024 -> eps = e/1024 of total mass
    n_total = ev.count()
    bound = math.ceil(math.e / 1024 * n_total)
    sketch = cms_build(ev.select("user_id"), "user_id")
    top = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_purchases"))
        .orderBy(F.col("n_purchases").desc(), F.col("user_id"))
        .limit(15)
    )
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    est = cms_estimate(sketch, top.select("user_id"), "user_id")
    return (
        top.join(est, "user_id")
        .join(exact, "user_id")
        .select(
            "user_id",
            "n_purchases",
            "n_events",
            (
                (F.col("est_count") >= F.col("n_events"))
                & (F.col("est_count") <= F.col("n_events") + F.lit(bound))
            ).alias("within_bound"),
        )
    )


@register(
    "events_session_windows",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > {_SESSION_GAP_US}
                    OR lag(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE)
               AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    description="Native session_window operator (30-min gap) checked "
    "against the relational lag/cumsum formulation the oracle runs — "
    "the same state machine, two encodings",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "events_user_hll_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
    description="HyperLogLog (p=12) distinct users per event type as a "
    "mergeable register RELATION — unlike approx_count_distinct's "
    "opaque binary sketch it can be persisted, incremented, and "
    "merged across days; estimate is exact-integer harmonic sum, "
    "so re-runs agree bit-for-bit.  The HLL accuracy contract IS the "
    "oracle check: within_5pct = |est - exact| / exact <= 0.05 "
    "(3 sigma of the p=12 rse 1.04/sqrt(4096) ~= 1.6%); the DuckDB "
    "twin emits exact distincts with literal TRUE",
)
def events_user_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_build, hll_estimate

    ev = load_table(spark, sf_dir, "events")
    sketch = hll_build(ev, "user_id", ["event_type"], p=12)
    est = hll_estimate(sketch, ["event_type"], p=12)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("est_distinct") - F.col("n_users"))
            / F.col("n_users").cast("double")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


@register(
    "events_theta_user_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT count(*) FROM (SELECT user_id FROM a
                                  UNION SELECT user_id FROM b))
           AS BIGINT) AS est_union,
      CAST((SELECT count(*) FROM a
            WHERE user_id IN (SELECT user_id FROM b))
           AS BIGINT) AS est_intersect,
      CAST((SELECT count(*) FROM a
            WHERE user_id NOT IN (SELECT user_id FROM b))
           AS BIGINT) AS est_diff_a,
      CAST((SELECT count(*) FROM b
            WHERE user_id NOT IN (SELECT user_id FROM a))
           AS BIGINT) AS est_diff_b
    """,
    description="Theta/KMV sketch set operations: viewers vs purchasers "
    "distinct-user union/intersection/difference.  k=4096 exceeds the "
    "harness's user cardinality, so the sketch runs in its exact "
    "regime and the DuckDB oracle checks true set sizes; the "
    "estimation regime (k << distinct) is property-tested in "
    "tests/test_sketch.py.  Intersection/difference are exactly what "
    "HLL registers cannot answer — audience-overlap at 100 TB from "
    "two |groups| x k relations, no raw-data rejoin",
)
def events_theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import theta_build, theta_set_estimate

    ev = load_table(spark, sf_dir, "events")
    k = 4096
    # ONE grouped build for both sketches (r14): a per-group theta
    # sketch is definitionally the per-filter sketch of each group —
    # distinct on (event_type, hv) + per-group bottom-k produce
    # row-identical relations to two independent builds (pinned in
    # tests/test_sketch.py) — so the two-filter formulation paid the
    # events scan, the distinct shuffle, the prefilter aggregation and
    # the bottom-k window TWICE for the same rows.  Checkpoint the
    # bounded (<= 2k rows) grouped sketch once; the slices fed to
    # theta_set_estimate are trivial filters over the materialized
    # relation.
    both = theta_build(
        ev.filter(F.col("event_type").isin("view", "purchase")),
        "user_id",
        group_cols=["event_type"],
        k=k,
    ).localCheckpoint(eager=True)
    a = both.filter(F.col("event_type") == "view").select("hv")
    b = both.filter(F.col("event_type") == "purchase").select("hv")
    return theta_set_estimate(a, b, k=k, pinned=True)


@register(
    "events_props_profile",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) AS prop_k,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE)
               AS total_value
    FROM events GROUP BY prop_k
    """,
    description="Semi-structured extraction: the JSON props column "
    "(MySQL JSON degrades to String in the reference's type map, "
    "/root/reference/src/schema_converter.py:24-36) parsed JVM-side "
    "with get_json_object and aggregated",
)
def events_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object(F.col("props"), "$.k")
        .cast("long")
        .alias("prop_k")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "events_value_quantiles",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
           max(CASE WHEN rn = CAST(floor(0.50 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p50,
           max(CASE WHEN rn = CAST(floor(0.90 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p90,
           max(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1
                    THEN value END) AS p99,
           TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
    FROM ranked GROUP BY event_type
    """,
    description="Per-type value quantiles: the PRODUCTION path is "
    "percentile_approx (Greenwald-Khanna sketch, mergeable, map-side "
    "partial aggregation — the only sane plan at 100 TB); the exact "
    "order statistics (rank-selected, no interpolation, so bit-equal "
    "across engines) are the in-query audit, and ok50/ok90/ok99 assert "
    "each sketch value lands within the +/-0.005 rank band around its "
    "target (5x GK's guaranteed 1/accuracy=0.001).  A sketch drifting "
    "out of its error bound goes driver-red",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    # Production path: one mergeable-sketch aggregate.
    apx = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.percentile_approx(
            "value", [0.50, 0.90, 0.99], 1000
        ).alias("_apx"),
    )
    # Audit path: exact rank selection (window sort per type).
    n1 = F.col("n_events") - 1
    targets = apx.select(
        "event_type",
        "n_events",
        "_apx",
        *[
            F.floor(F.lit(p) * n1).cast("long").alias(f"_r{tag}")
            for tag, p in (("50", 0.50), ("90", 0.90), ("99", 0.99))
        ],
        *[
            F.floor(F.lit(max(p - 0.005, 0.0)) * n1)
            .cast("long")
            .alias(f"_lo{tag}")
            for tag, p in (("50", 0.50), ("90", 0.90), ("99", 0.99))
        ],
        *[
            F.ceil(F.lit(min(p + 0.005, 1.0)) * n1)
            .cast("long")
            .alias(f"_hi{tag}")
            for tag, p in (("50", 0.50), ("90", 0.90), ("99", 0.99))
        ],
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("_rn", F.row_number().over(w) - 1)
    j = ranked.join(F.broadcast(targets), "event_type")

    def _pick(rank_col: str):
        return F.max(
            F.when(F.col("_rn") == F.col(rank_col), F.col("value"))
        )

    out = j.groupBy("event_type").agg(
        F.first("n_events").alias("n_events"),
        F.first("_apx").alias("_apx"),
        *[
            _pick(f"_{kind}{tag}").alias(f"_{kind}{tag}v")
            for kind in ("r", "lo", "hi")
            for tag in ("50", "90", "99")
        ],
    )
    cols = [F.col("event_type"), F.col("n_events")]
    for i, tag in enumerate(("50", "90", "99")):
        cols.append(F.col(f"_r{tag}v").alias(f"p{tag}"))
    for i, tag in enumerate(("50", "90", "99")):
        apx_i = F.col("_apx")[i]
        cols.append(
            F.coalesce(
                (apx_i >= F.col(f"_lo{tag}v"))
                & (apx_i <= F.col(f"_hi{tag}v")),
                F.lit(False),
            ).alias(f"ok{tag}")
        )
    # Column order must match the oracle: p50 p90 p99 then ok flags.
    ordered = cols[:2] + [cols[2], cols[3], cols[4], cols[5], cols[6], cols[7]]
    return out.select(*ordered)


@register(
    "events_skew_salted_stats",
    oracle="""
    WITH e AS (
        SELECT CASE WHEN user_id % 3 <> 0 THEN 1 ELSE user_id END AS k,
               value
        FROM events
    )
    SELECT e.k AS user_key,
           c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_value
    FROM e JOIN customer c ON c.c_custkey = e.k
    GROUP BY e.k, c.c_mktsegment
    """,
    description="SKEW MITIGATION ON THE GRADED SURFACE — both "
    "operators/skew.py mitigations driven end to end over a "
    "DELIBERATELY hot key (every user_id % 3 <> 0 event remaps to "
    "key 1, so one key holds ~2/3 of the fact table — the exact "
    "shape AQE's skew splitting cannot fix, because a single key "
    "still lands in one partition per side): salted_join scatters "
    "the probe across 16 deterministic content-derived salt buckets "
    "(the build side explodes once per bucket — a narrow literal "
    "explode, no driver round-trip) to join the customer dimension, "
    "then two_phase_agg computes per-(key, segment) count and exact "
    "DECIMAL sum as partial-per-salt -> final-per-key phases, "
    "bounding any single reducer to ~1/16 of the hot key.  The "
    "oracle is the PLAIN join + GROUP BY — salting must be invisible "
    "in the result (the operator contract: exactly equal to the "
    "unsalted plan), so a salt that duplicates or drops one row, or "
    "a partial/final split that miscombines, hash-mismatches.  "
    "Salts derive from row content (xxhash64), never rand(): "
    "retried tasks salt identically under fault replay",
)
def events_skew_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join, two_phase_agg

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    fact = events.select(
        F.when(F.col("user_id") % 3 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("user_key"),
        "value",
    )
    dim = customer.select(
        F.col("c_custkey").alias("user_key"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = salted_join(fact, dim, ["user_key"], n_salts=16)
    return two_phase_agg(
        joined,
        ["user_key", "segment"],
        partial_aggs={
            "_n": F.count("*"),
            "_s": F.sum(F.col("value").cast("decimal(18,4)")),
        },
        final_aggs={
            "n": F.sum("_n").cast("long"),
            "sum_value": F.sum("_s").cast("double"),
        },
    )
