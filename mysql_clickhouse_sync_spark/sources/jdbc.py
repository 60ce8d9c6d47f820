"""JDBC source/sink configuration for real MySQL deployments.

The harness has no MySQL, so nothing here executes in tests — but this
is the production wiring the reference's MySQL client maps to
(``/root/reference/src/mysql_client.py``), and the partitioned-read
upgrade SURVEY.md §4 calls out:

* the reference scans each table through ONE server-side cursor
  (``src/mysql_client.py:150``) — single-threaded per table;
* Spark's JDBC source with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` issues N concurrent range queries, and ``fetchsize``
  replaces the reference's 50k-row batching
  (``src/config.py:72``).

Predicate pushdown and column pruning reach the JDBC source
automatically (Catalyst DSv1 JDBC pushdown), matching the reference's
explicit column list + binlog-side filters (S6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..schema.mysql_types import validate_identifier


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Connection settings (parity: pydantic env config,
    /root/reference/src/config.py:22-93; secrets should come from the
    cluster's secret manager, not literals)."""

    url: str                    # jdbc:mysql://host:3306/db
    user: str
    password: str
    fetchsize: int = 50_000     # ≙ REPLICATION_BATCH_SIZE default
    num_partitions: int = 8
    dialect: str = "mysql"      # mysql | postgresql | clickhouse

    def options(self) -> dict[str, str]:
        from .dialects import get_dialect

        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetchsize),
            "driver": get_dialect(self.dialect).driver,
        }


def read_table(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Partitioned JDBC scan of one table.

    With a numeric ``partition_column`` (typically the auto-increment
    PK) the scan runs ``num_partitions`` concurrent range queries —
    the scale path.  Without one, a single-cursor scan (exactly the
    reference's behavior) is used.
    """
    validate_identifier(table, "table")
    reader = spark.read.format("jdbc").options(**cfg.options()).option(
        "dbtable", table
    )
    if partition_column is not None:
        validate_identifier(partition_column, "column")
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(cfg.num_partitions))
        )
    return reader.load()


def write_table(
    df: DataFrame, cfg: JdbcSourceConfig, table: str, mode: str = "append"
) -> None:
    """JDBC batch-insert sink (parity: S7,
    /root/reference/src/clickhouse_client.py:88-105; ``batchsize``
    replaces the reference's tuple-batch inserts)."""
    validate_identifier(table, "table")
    (
        df.write.format("jdbc")
        .options(**cfg.options())
        .option("dbtable", table)
        .option("batchsize", str(cfg.fetchsize))
        .mode(mode)
        .save()
    )
