"""Set-operation queries: UNION / UNION ALL / INTERSECT / EXCEPT
(+ ALL variants).

The reference has no explicit set operators (SURVEY.md §2.8) — its only
set-ish behavior is the CDC bag-union (`unionByName` + dedup-latest,
covered by cdc_queries.py). These queries expose the full relational
set surface our engine inherits from Spark, each checked against the
identical DuckDB construct.

Scale notes: INTERSECT/EXCEPT compile to a shuffle on the full row as
key (Catalyst rewrites to left-semi / left-anti aggregates); we always
project to the few needed columns FIRST so the shuffle carries bytes
proportional to the key, not the row. UNION ALL is shuffle-free
(plain concatenation of partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "nations_with_customers_and_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    description="INTERSECT (distinct set intersection) — Catalyst "
    "rewrites to left-semi join over pre-projected single-column "
    "inputs, so the shuffle key is 8 bytes/row",
)
def nations_with_customers_and_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@register(
    "parts_never_bulk_ordered",
    oracle="""
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 40
    """,
    description="EXCEPT (distinct set difference) — the anti-join "
    "diff shape also used by verify_diff (SURVEY.md §2.4 A2 upgrade); "
    "projection+filter first keeps the shuffled sides narrow",
)
def parts_never_bulk_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 40)
        .select(F.col("l_partkey").alias("partkey"))
    )
    return part.subtract(li)


@register(
    "active_nation_keys_union",
    oracle="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n_parties FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    description="UNION ALL (bag union, zero-shuffle concatenation) "
    "followed by one partial-aggregated count — the two scans run as "
    "independent stages feeding a single exchange",
)
def active_nation_keys_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_parties"))
    )


@register(
    "order_priority_overlap_all",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    """,
    description="INTERSECT ALL (multiset intersection keeps min "
    "multiplicity per value) — distinct-vs-all semantics round out the "
    "set surface; implemented with Spark's native intersectAll",
)
def order_priority_overlap_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    done_p = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    return open_p.intersectAll(done_p)


@register(
    "doc_sources_except_all",
    oracle="""
    SELECT source FROM documents WHERE lang = 'en'
    EXCEPT ALL
    SELECT source FROM documents WHERE lang <> 'en'
    """,
    description="EXCEPT ALL (multiset difference: multiplicity "
    "max(m1-m2, 0) per value) via Spark exceptAll — the bag-diff "
    "primitive behind replication-lag row accounting",
)
def doc_sources_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("source")
    rest = docs.filter(F.col("lang") != "en").select("source")
    return en.exceptAll(rest)
