"""Relational analytics over the TPC-H-ish tables.

The reference has no query engine of its own — users query the
replicated ClickHouse tables (``/root/reference/README.md:435-449``).
These queries are that read path, Spark-first: aggregations, joins
(broadcast + shuffled), windows, top-k, set ops, rollup — each a shape
Catalyst optimizes (SURVEY.md §2.4-2.8, §4).

Scale notes: explicit ``F.broadcast`` hints appear ONLY on provably
bounded sides (region/nation, 1-row scalar aggregates).  Everything
else — customer/supplier/part/orders — is left to the planner: under
the 64 MB threshold + AQE they broadcast at harness scale and switch
to co-partitioned shuffle joins at 100 TB, where "dimensions" are
billions of rows and a forced broadcast would OOM every executor.
Aggregates use DECIMAL so partial (map-side) combine stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

D2 = "decimal(12,2)"  # product-safe money type (12+12+12 = 36 <= 38)


def _disc_price():
    return F.col("l_extendedprice").cast(D2) * (
        F.lit(1) - F.col("l_discount")
    ).cast(D2)


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - l_discount AS DECIMAL(12,2))"
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_SQL_DISC_PRICE} * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary (scan -> filter -> partial+final agg)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(D2)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(D2)).cast("double").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(_disc_price() * (F.lit(1) + F.col("l_tax")).cast(D2))
        .cast("double")
        .alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast(D2)).cast("double") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: broadcast dim join + agg + deterministic top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    description="TPC-H Q5: 6-way join, all dims broadcast, one fact shuffle",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    description="Global top-k (TakeOrderedAndProject — no full sort at scale)",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "segment_order_stats",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    description="Join + distinct aggregate (two-phase distinct under AQE)",
)
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast(D2)).cast("double").alias("total_value"),
            (F.sum(F.col("o_totalprice").cast(D2)).cast("double") / F.count("*")).alias("avg_value"),
        )
    )


@register(
    "customer_top_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    description="Per-group top-k via ranking window (single PK shuffle)",
)
def customer_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    description="Cumulative window aggregate (analytic frame)",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(D2))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "sales_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    description="ROLLUP grouping sets (hierarchical subtotals, one pass)",
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(D2)).cast("double").alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def _cust_with_status(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
        .distinct()
    )


@register(
    "repeat_status_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    description="INTERSECT set operation",
)
def repeat_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_with_status(spark, sf_dir, "F").intersect(
        _cust_with_status(spark, sf_dir, "O")
    )


@register(
    "exclusive_status_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    description="EXCEPT set operation",
)
def exclusive_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_with_status(spark, sf_dir, "F").exceptAll(
        _cust_with_status(spark, sf_dir, "O")
    ).distinct()


@register(
    "customers_without_big_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 450000
    )
    """,
    description="Left-anti join (the row-diff half of verify_diff, "
    "upgrade over count-only verification at "
    "/root/reference/src/replicator.py:69-81)",
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "big_spender_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
    description="Left-semi join",
)
def big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "priority_order_profile",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    description="Distinct-agg + min/max profile per priority class",
)
def priority_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
