"""SQL surface (SURVEY.md §7 M6): the engine's tables and CDC live
views registered in the session catalog and queried with ``spark.sql``.

Parity: the reference's end state is a ClickHouse database whose users
run plain SQL against the replicated tables and generated ``_live``
views (``/root/reference/README.md:435-449``,
``/root/reference/src/schema_converter.py:124-138``).  Here the SAME
ANSI SQL string is executed by Spark (over registered temp views) and
by DuckDB (as the oracle) — the strongest form of the dialect check.

Catalyst treats a ``spark.sql`` query identically to the DataFrame
API: same logical plan, same pushdown/broadcast/AQE decisions, so the
scale posture of the DataFrame queries carries over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import register_live_view
from ..sources.changelog import ORDERS_PK
from ..sources.parquet import register_tables
from .cdc_queries import _applied_orders
from .registry import register

# Identical text runs on Spark and DuckDB (ANSI-common subset).
_REGION_REVENUE_SQL = """
    SELECT r_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
"""

_LIVE_SEGMENT_SQL = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_live_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders_live
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


@register(
    "sql_region_revenue",
    oracle=_REGION_REVENUE_SQL,
    description="spark.sql over catalog-registered tables — the same "
    "SQL string is the DuckDB oracle (M6 SQL surface)",
)
def sql_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_REGION_REVENUE_SQL)


@register(
    "sql_live_segment_stats",
    oracle="""
    WITH snap AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority,
               CAST(0 AS BIGINT) AS _version, 0 AS _deleted,
               CAST(NULL AS BIGINT) AS _seq
        FROM orders
    ), u1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
               o_orderdate, o_orderpriority,
               CAST(1 AS BIGINT) AS _version, 0 AS _deleted,
               CAST(1 AS BIGINT) AS _seq
        FROM orders WHERE o_orderkey % 7 = 0
    ), d2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority,
               CAST(2 AS BIGINT) AS _version, 1 AS _deleted,
               CAST(2 AS BIGINT) AS _seq
        FROM orders WHERE o_orderkey % 7 = 1
    ), u3 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * CAST(1.2 AS DOUBLE) AS o_totalprice,
               o_orderdate, o_orderpriority,
               CAST(3 AS BIGINT) AS _version, 0 AS _deleted,
               CAST(3 AS BIGINT) AS _seq
        FROM orders WHERE o_orderkey % 14 = 0
    ), i4 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, '5-REINSERTED' AS o_orderpriority,
               CAST(4 AS BIGINT) AS _version, 0 AS _deleted,
               CAST(4 AS BIGINT) AS _seq
        FROM orders WHERE o_orderkey % 14 = 1
    ), applied AS (
        SELECT * FROM snap
        UNION ALL SELECT * FROM u1
        UNION ALL SELECT * FROM u1
        UNION ALL SELECT * FROM d2
        UNION ALL SELECT * FROM u3
        UNION ALL SELECT * FROM i4
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderkey
            ORDER BY _version DESC, _seq DESC NULLS LAST
        ) AS __rn
        FROM applied
    ), orders_live AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM ranked WHERE __rn = 1 AND _deleted = 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_live_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders_live
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    description="spark.sql over the registered orders_live CDC view "
    "joined to a dimension — the reference's generated-view read path "
    "(S12) exercised through the catalog",
)
def sql_live_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    register_live_view(_applied_orders(spark, sf_dir), "orders", ORDERS_PK)
    return spark.sql(_LIVE_SEGMENT_SQL)
