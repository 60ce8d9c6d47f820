"""Raw-feed ingestion queries: the dead-letter quarantine surface.

The reference's source (MySQL) enforces types server-side; a raw
text feed does not — these rows grade the parse/validate/quarantine
split (``sources/ingest.py``) end to end against a closed-form
corruption rule DuckDB replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "orders_csv_ingest_quarantine",
    oracle="""
    SELECT o_orderpriority AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders WHERE o_orderkey % 13 NOT IN (3, 7)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'quarantine:malformed', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 3
    UNION ALL
    SELECT 'quarantine:invalid_price', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 7
    """,
    description="DEAD-LETTER CSV INGESTION, end to end: orders rows "
    "are serialized to raw CSV lines with a closed-form corruption "
    "rule — every o_orderkey % 13 = 3 line carries an unparseable "
    "price ('xx': PERMISSIVE from_csv nulls the field and fills the "
    "corrupt-record column) and every % 13 = 7 line carries a "
    "NEGATIVE price (parses fine, fails the semantic validator) — "
    "then parse_csv_with_quarantine splits the feed: valid rows "
    "aggregate per priority (exact DECIMAL sums; the double -> "
    "string -> double CSV round trip is exact because Spark renders "
    "shortest-roundtrip representations), quarantined rows count "
    "under their deterministic reason with the RAW line preserved.  "
    "The oracle replays the corruption rule directly against orders, "
    "so a parse split that loses, double-counts, or mis-reasons one "
    "line hash-mismatches.  The operator contract (first-failing "
    "reason, null-never-passes validation, whole-line quarantine) is "
    "unit-pinned in tests/test_ingest.py",
)
def orders_csv_ingest_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.ingest import parse_csv_with_quarantine

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    price_txt = F.when(
        key % 13 == 3, F.lit("xx")
    ).when(
        key % 13 == 7, (-F.col("o_totalprice")).cast("string")
    ).otherwise(F.col("o_totalprice").cast("string"))
    lines = orders.select(
        F.concat_ws(
            ",", key.cast("string"), price_txt, F.col("o_orderpriority")
        ).alias("line")
    )
    valid, quarantine = parse_csv_with_quarantine(
        lines,
        "line",
        "k LONG, price DOUBLE, prio STRING",
        validators={"invalid_price": F.col("price") >= 0},
    )
    good = valid.groupBy(F.col("prio").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("price").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
    dead = quarantine.groupBy(
        F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.lit(None).cast("double").alias("sum_price"),
    )
    return good.unionByName(dead)
