"""Parquet source for the harness tables.

The reference's sources are the MySQL wire + replication protocols
(``/root/reference/src/mysql_client.py``); the harness exercises the
same operators over Parquet — columnar at rest exactly like the
reference's ClickHouse target, so projection pushdown / predicate
pushdown / min-max row-group skipping all apply (SURVEY.md §4).

Scale note: ``spark.read.parquet`` plans one task per ~128 MB split;
at 100 TB that is ~800k tasks — fine for a 1000-executor cluster.
Column pruning means a 2-column projection reads 2 columns, verified
in tests via ``ReadSchema`` in the formatted plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one harness table (S3 in SURVEY.md §2.1: projection is the
    caller's ``.select`` — Catalyst pushes it into the scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as long ns (legacy conf) and
    floor-truncate to microseconds — the exact behavior of DuckDB's
    ns->us read, so oracle comparisons agree.  Integer ``div`` keeps
    the arithmetic exact (doubles can't hold 1.7e18 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # -> NTZ so rendering is session-timezone-independent, matching
        # both the other tables (parquet ms, isAdjustedToUTC=false) and
        # DuckDB's naive TIMESTAMP.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every harness table as a temp view for the SQL surface
    (parity: the reference registers tables in ClickHouse's catalog)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
