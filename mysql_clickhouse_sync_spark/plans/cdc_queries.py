"""CDC semantic-core queries — the reference's capability surface.

These exercise, end-to-end, everything the reference actually does
(SURVEY.md §3): snapshot stamping (C5), changelog apply (C1-C3),
dedup-latest (A3 / ReplacingMergeTree FINAL), soft-delete filtering
(P4) and system-column projection (P3) — over the deterministic
changelog derived from ``orders`` (sources/changelog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import (
    dedup_latest,
    live_view,
    scd2_history,
)
from ..sources.changelog import (
    ORDERS_PK,
    applied_orders_single_scan,
)
from ..sources.parquet import load_table
from .registry import register

_USER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

# Shared oracle CTE block: snapshot + derived changelog, stamped.
# Mirrors sources/changelog.py exactly (same filters, same arithmetic,
# same versions); scalar double math is IEEE-identical across engines.
_ORACLE_CDC_CTES = f"""
WITH snap AS (
    SELECT {_USER_COLS},
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
    SELECT {_USER_COLS},
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
)
"""


def _applied_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied relation in ONE scan of orders: snapshot image and
    events both derive from the same source row, so a single
    conditional explode replaces the snapshot-scan + changelog-scan
    union — the table is read once, not twice (pinned in
    tests/test_plans.py; row-identical to the two-scan
    ``cdc_apply(snapshot_with_cdc_columns(...),
    stamp_changelog(derive_orders_changelog(...)))`` composition,
    asserted in tests/test_cdc.py).  ``spread`` fans the explode out
    on a small local scan and no-ops on a real cluster's many
    splits."""
    from ..util import spread

    return applied_orders_single_scan(
        spread(load_table(spark, sf_dir, "orders"))
    )


@register(
    "cdc_live_orders",
    oracle=_ORACLE_CDC_CTES
    + f"SELECT {_USER_COLS} FROM ranked WHERE __rn = 1 AND _deleted = 0",
    description="Flagship: snapshot + changelog -> live view "
    "(ReplacingMergeTree FINAL + soft-delete semantics, "
    "/root/reference/src/schema_converter.py:118-138)",
)
def cdc_live_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return live_view(_applied_orders(spark, sf_dir), ORDERS_PK)


@register(
    "cdc_versions_per_key",
    oracle=_ORACLE_CDC_CTES
    + """
    SELECT n_versions, CAST(count(*) AS BIGINT) AS n_keys
    FROM (
        SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_versions
        FROM applied GROUP BY o_orderkey
    ) GROUP BY n_versions
    """,
    description="Version-chain length histogram over the applied table "
    "(observability for merge-on-read cost)",
)
def cdc_versions_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _applied_orders(spark, sf_dir)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_versions"))
        .groupBy("n_versions")
        .agg(F.count("*").alias("n_keys"))
    )


@register(
    "cdc_compacted_state",
    oracle=_ORACLE_CDC_CTES
    + "SELECT o_orderkey, _version, _deleted FROM ranked WHERE __rn = 1",
    description="compact(): materialized dedup incl. tombstones "
    "(ClickHouse background merge equivalent)",
)
def cdc_compacted_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_latest(_applied_orders(spark, sf_dir), ORDERS_PK).select(
        "o_orderkey", "_version", "_deleted"
    )


@register(
    "cdc_scd2_history",
    oracle=_ORACLE_CDC_CTES
    + """
    , ver AS (
        SELECT o_orderkey, _version, _deleted, o_orderstatus,
               o_orderpriority,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
               row_number() OVER (
                   PARTITION BY o_orderkey, _version
                   ORDER BY _seq DESC NULLS LAST
               ) AS __vn
        FROM applied
    ), hist AS (
        SELECT o_orderkey, _version AS valid_from,
               lead(_version) OVER (
                   PARTITION BY o_orderkey ORDER BY _version
               ) AS valid_to,
               _deleted, o_orderstatus, o_orderpriority, price_cents
        FROM ver WHERE __vn = 1
    )
    SELECT o_orderkey, valid_from, valid_to, _deleted,
           (valid_to IS NULL AND _deleted = 0) AS is_current,
           o_orderstatus, o_orderpriority, price_cents
    FROM hist
    """,
    description="SCD Type-2 history view over the version log: validity "
    "intervals [valid_from, valid_to) per key with is_current flags — "
    "the append-only ReplacingMergeTree store "
    "(/root/reference/src/schema_converter.py:118) exposed as queryable "
    "history, replay-deduped; one shuffle (both windows share the PK "
    "partitioning)",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = scd2_history(_applied_orders(spark, sf_dir), ORDERS_PK)
    return hist.select(
        "o_orderkey",
        "valid_from",
        "valid_to",
        "_deleted",
        "is_current",
        "o_orderstatus",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )


@register(
    "cdc_live_agg",
    oracle=_ORACLE_CDC_CTES
    + """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM ranked WHERE __rn = 1 AND _deleted = 0
    GROUP BY o_orderstatus
    """,
    description="Aggregate over the live view: the 'query ClickHouse "
    "via the _live view' read path (/root/reference/README.md:435-449)",
)
def cdc_live_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = live_view(_applied_orders(spark, sf_dir), ORDERS_PK)
    # floor-to-cents before summing: the updated prices are derived
    # doubles, and double->DECIMAL rounding is engine-specific at the
    # last ulp; floor of an IEEE-identical double is exact in both.
    return live.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )
