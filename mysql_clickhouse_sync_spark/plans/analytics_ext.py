"""Extended relational analytics: the TPC-H query shapes not already
covered by ``analytics.py``.

The reference ships no query engine — its users run exactly this kind
of SQL against the replicated ClickHouse tables
(``/root/reference/README.md:435-449``).  Each query here adds a
distinct plan shape (scalar subquery, argmin window, disjunctive join
predicate, conditional-ratio aggregate, agg-of-agg histogram, dual-role
dimension join) so the engine's read path is exercised the way a real
warehouse workload would.

Scale notes: explicit ``F.broadcast`` only on provably bounded sides
(region/nation and 1-row scalar aggregates — q15 max, q22 avg, q11
threshold — never a single-partition window); the planner's 64 MB
threshold + AQE pick broadcast vs shuffle for everything else, so the
same plans hold from the harness to 100 TB.  Money math follows the
registry determinism rules: DECIMAL partial aggregation, double
division only as the final step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

D2 = "decimal(12,2)"


def _disc_price():
    return F.col("l_extendedprice").cast(D2) * (
        F.lit(1) - F.col("l_discount")
    ).cast(D2)


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - l_discount AS DECIMAL(12,2))"
)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan->filter->agg; every predicate is "
    "pushed to the parquet scan (min/max row-group skipping)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast(D2) * F.col("l_discount").cast(D2)
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               {_SQL_DISC_PRICE} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: nation plays two roles (aliased broadcast "
    "joins), disjunctive pair predicate, year bucketing",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               {_SQL_DISC_PRICE} AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    description="TPC-H Q8: market-share ratio via conditional DECIMAL "
    "sums, one double division at the end",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(25,4)")
    return joined.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q9_product_margin",
    oracle=f"""
    SELECT n_name AS nation, o_year,
           CAST(SUM(amount) AS DOUBLE) AS margin
    FROM (
        SELECT n_name,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))
                 - {_SQL_DISC_PRICE} AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY n_name, o_year
    """,
    description="TPC-H Q9 shape: margin (retail value minus discounted "
    "revenue) per supplier-nation per year, LIKE filter on part name",
)
def q9_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("p_retailprice").cast(D2) * F.col("l_quantity").cast(D2)
        - _disc_price()
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("margin"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: top-20 customers by returned-item revenue "
    "(multi-join -> agg -> deterministic top-k)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    description="TPC-H Q12 shape: conditional counts (CASE-sum) per "
    "line status over a fact-fact join",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT OUTER JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    description="TPC-H Q13: agg-of-agg histogram over a left outer "
    "join (customers keep a 0 bucket)",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN {_SQL_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    description="TPC-H Q14: promo revenue percentage (conditional "
    "DECIMAL sums, single double division)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
                ).cast("double")
                / F.sum(_disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    description="TPC-H Q15: top supplier via scalar-subquery max "
    "(1-row aggregate broadcast, no single-partition window)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("_max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue0.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("_max_rev")
        )
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey,
               0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                      / count(*)) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    ) pa ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < qty_threshold
    """,
    description="TPC-H Q17: per-part average-quantity threshold "
    "(correlated aggregate as a co-grouped join; threshold computed as "
    "exact DECIMAL sum / count to stay order-insensitive)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast(D2)).cast("double")
                / F.count("*")
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(D2)).cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="TPC-H Q18: HAVING-filtered IN subquery (semi-join on "
    "an aggregate) + top-100 large-volume orders",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(D2)).alias("_sq"))
        .filter(F.col("_sq") > 200)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(big_orders.withColumnRenamed("l_orderkey", "_bk"),
                li.l_orderkey == F.col("_bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(D2)).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    description="TPC-H Q19: disjunction of conjunctive ranges — "
    "Catalyst still extracts the partkey equi-join key",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
    description="TPC-H Q22 shape: scalar-average subquery (broadcast "
    "1-row agg) + anti-join on recent orders, per-nation rollup",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(D2)).cast("double") / F.count("*")
            ).alias("_avg_bal")
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(D2))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
    SELECT p_partkey, p_name, cheapest_suppkey, unit_price
    FROM (
        SELECT l_partkey, l_suppkey AS cheapest_suppkey,
               l_extendedprice / l_quantity AS unit_price,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_extendedprice / l_quantity,
                            l_suppkey, l_orderkey, l_linenumber
               ) AS rn
        FROM lineitem
    ) ranked
    JOIN part ON p_partkey = l_partkey
    WHERE rn = 1 AND p_size < 10
    """,
    description="TPC-H Q2 shape (no partsupp table in the harness): "
    "argmin-per-group via ranking window with a full tie-break chain",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unit_price = F.col("l_extendedprice") / F.col("l_quantity")
    w = Window.partitionBy("l_partkey").orderBy(
        unit_price, F.col("l_suppkey"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        li.select(
            "l_partkey",
            F.col("l_suppkey").alias("cheapest_suppkey"),
            unit_price.alias("unit_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "cheapest_suppkey", "unit_price")
    )


@register(
    "q4_late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS semi-join with a correlated "
    "inequality (shipment later than 60 days after the order)",
)
def q4_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q11_part_value_concentration",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value FROM pv
    WHERE part_value > (
        SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) * 0.001
        FROM lineitem
    )
    """,
    description="TPC-H Q11 shape: HAVING against a scalar fraction of "
    "the global total (1-row aggregate broadcast, no second scan of "
    "the grouped data)",
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(_disc_price()).cast("double").alias("part_value")
    )
    threshold = li.agg(
        (F.sum(_disc_price()).cast("double") * F.lit(0.001))
        .alias("_thr")
    )
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("_thr"))
        .select("l_partkey", "part_value")
    )


@register(
    "q21_last_shipper_in_shared_orders",
    oracle="""
    WITH marked AS (
        SELECT l_orderkey, l_suppkey, l_shipdate,
               count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
                   AS n_supps,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_shipdate DESC, l_suppkey, l_linenumber
               ) AS rn
        FROM lineitem
    )
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_blocking_orders
    FROM marked WHERE rn = 1 AND n_supps >= 2
    GROUP BY l_suppkey
    ORDER BY n_blocking_orders DESC, l_suppkey
    LIMIT 10
    """,
    description="TPC-H Q21 shape: per-order latest shipper among "
    "multi-supplier orders (two windows over one shuffle, then agg + "
    "deterministic top-k)",
)
def q21_last_shipper_in_shared_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    by_order = Window.partitionBy("l_orderkey")
    rn = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_shipdate").desc(), F.col("l_suppkey"), F.col("l_linenumber")
    )
    marked = li.select(
        "l_suppkey",
        F.size(F.collect_set("l_suppkey").over(by_order)).alias("n_supps"),
        F.row_number().over(rn).alias("rn"),
    )
    return (
        marked.filter((F.col("rn") == 1) & (F.col("n_supps") >= 2))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_blocking_orders"))
        .orderBy(F.col("n_blocking_orders").desc(), F.col("l_suppkey"))
        .limit(10)
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 25
    """,
    description="TPC-H Q16 shape: NOT IN anti-join exclusion list + "
    "distinct-count per part attribute triple, deterministic top-25",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            excluded,
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
        .limit(25)
    )


@register(
    "q20_dominant_promo_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                    AS DECIMAL(38,2)) AS sp_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'cold%'
        GROUP BY l_suppkey, l_partkey
    ), pp AS (
        SELECT l_partkey,
               CAST(SUM(sp_qty) AS DOUBLE) / count(*) AS avg_qty
        FROM sp GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, n_name,
           CAST(count(*) AS BIGINT) AS n_dominant_parts
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN sp ON sp.l_suppkey = s_suppkey
    JOIN pp ON pp.l_partkey = sp.l_partkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
      AND CAST(sp_qty AS DOUBLE) > 1.5 * avg_qty
    GROUP BY s_suppkey, s_name, n_name
    """,
    description="TPC-H Q20 shape (no partsupp in the harness): "
    "name-pattern part filter -> per-(supplier, part) quantity vs a "
    "correlated per-part average threshold -> semi-join back to "
    "supplier/nation.  The threshold reuses the grouped relation "
    "(no second lineitem scan); part and nation sides broadcast",
)
def q20_dominant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("cold%"))
        .select("p_partkey")
    )
    sp = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(D2))
            .cast("decimal(38,2)")
            .alias("sp_qty")
        )
    )
    pp = sp.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        (F.sum("sp_qty").cast("double") / F.count("*")).alias("avg_qty")
    )
    dominant = sp.join(pp, sp.l_partkey == pp.pp_partkey).filter(
        F.col("sp_qty").cast("double") > 1.5 * F.col("avg_qty")
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_12")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        dominant.join(supp, dominant.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count("*").alias("n_dominant_parts"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE)) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), regional AS (
        SELECT c.l_partkey, c.unit_cost, s.s_name, s.s_acctbal, n.n_name
        FROM costs c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ), ranked AS (
        SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best
        FROM regional
    )
    SELECT k.s_acctbal, k.s_name, k.n_name,
           CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_type,
           k.unit_cost
    FROM ranked k JOIN part p ON p.p_partkey = k.l_partkey
    WHERE p.p_type = 'STANDARD' AND k.unit_cost = k.best
    ORDER BY k.s_acctbal DESC, k.n_name, k.s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2 adapted (no partsupp table in the harness): "
    "supply cost per (part, supplier) is derived as the minimum "
    "observed unit price in lineitem; for STANDARD parts, the EUROPE "
    "supplier(s) achieving the per-part minimum, richest first.  Plan "
    "shape: agg -> dim joins -> per-group argmin window -> selective "
    "dim join.  Unit cost is one double division of parquet doubles — "
    "bit-identical in Spark and DuckDB, so the min-equality predicate "
    "is oracle-stable (registry determinism rules).  nation/region "
    "broadcast explicitly (bounded); supplier/part joins left to "
    "AQE — supplier scales with SF, so no hand broadcast",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    regional = (
        costs.join(sup, costs.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
        )
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    w = Window.partitionBy("l_partkey")
    best = regional.withColumn("best", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_type",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "customer_order_momentum",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_run
                AS DOUBLE) AS lifetime_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_mov
                AS DOUBLE) AS moving3_spend,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_mov
                     AS DOUBLE)
                / COUNT(*) OVER w_mov AS DOUBLE) AS moving3_avg,
           CAST(ntile(4) OVER w_ord AS INT) AS spend_quartile
    FROM orders
    WINDOW
      w_ord AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey),
      w_run AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_mov AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    description="Window-frame analytics in ONE exchange: running "
    "lifetime spend (unbounded frame), 3-order moving sum/avg "
    "(bounded ROWS frame), and ntile(4) position within each "
    "customer's history — every window shares one partitioning "
    "(custkey) and one sort (orderdate, orderkey full tie-break), so "
    "Spark plans a single shuffle + sort for all four columns.  "
    "DECIMAL running sums, one double division last (registry "
    "determinism rules); ntile is deterministic because the ordering "
    "is total",
)
def customer_order_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w.rowsBetween(-2, Window.currentRow)
    price = F.col("o_totalprice").cast(D2)
    mov_sum = F.sum(price).over(w_mov)
    return o.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.sum(price).over(w_run).cast("double").alias(
            "lifetime_spend"
        ),
        mov_sum.cast("double").alias("moving3_spend"),
        (
            mov_sum.cast("double") / F.count("*").over(w_mov)
        ).alias("moving3_avg"),
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
    )
