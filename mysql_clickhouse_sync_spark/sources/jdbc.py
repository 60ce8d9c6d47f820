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


def probe_bounds(
    spark: SparkSession, cfg: JdbcSourceConfig, table: str, column: str
) -> tuple[int | None, int | None]:
    """One-row pushdown probe ``SELECT MIN(col), MAX(col)`` used to
    derive partition bounds automatically (the step the reference
    never needed because it scans single-threaded).

    Runs as a JDBC subquery so the aggregation executes ON THE SOURCE
    (an index-only scan when ``column`` is the PK) — nothing but two
    longs crosses the wire.  Returns ``(None, None)`` for an empty
    table; callers then fall back to the single-cursor scan.
    """
    validate_identifier(table, "table")
    validate_identifier(column, "column")
    probe = (
        f"(SELECT MIN({column}) AS lo, MAX({column}) AS hi "
        f"FROM {table}) AS bounds_probe"
    )
    row = (
        spark.read.format("jdbc")
        .options(**cfg.options())
        .option("dbtable", probe)
        .load()
        .collect()[0]
    )
    if row["lo"] is None:
        return None, None
    return int(row["lo"]), int(row["hi"])


def read_table_auto(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    table: str,
    partition_column: str,
) -> DataFrame:
    """Partitioned scan with auto-probed bounds: probe min/max of the
    numeric partition column, then fan out ``num_partitions`` range
    queries.  Spark strides the range uniformly — fine for dense
    auto-increment PKs (the reference's usual shape); for sparse or
    skewed keys use :func:`read_table_predicates`.
    """
    lo, hi = probe_bounds(spark, cfg, table, partition_column)
    if lo is None or lo == hi:
        # empty or single-key table: stride partitioning degenerates,
        # use the plain single-cursor scan
        return read_table(spark, cfg, table)
    return read_table(
        spark, cfg, table, partition_column, lower_bound=lo, upper_bound=hi
    )


def read_table_predicates(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    table: str,
    column: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """Hash-bucketed parallel scan for NON-numeric or skewed keys.

    Spark's stride partitioning needs a dense numeric column; string
    PKs or hot-spotted ids get uneven splits.  This issues one query
    per hash bucket (``MOD(source_hash(col), N)``) via the JDBC
    ``predicates`` API — each bucket has ~uniform cardinality whatever
    the key distribution, because the hash is computed source-side.
    """
    validate_identifier(table, "table")
    validate_identifier(column, "column")
    n = num_buckets or cfg.num_partitions
    if cfg.dialect == "mysql":
        bucket = f"MOD(crc32({column}), {n})"
    elif cfg.dialect == "postgresql":
        bucket = f"MOD(abs(hashtext({column}::text)), {n})"
    else:  # clickhouse
        bucket = f"cityHash64({column}) % {n}"
    predicates = [f"{bucket} = {i}" for i in range(n)]
    return spark.read.jdbc(
        url=cfg.url,
        table=table,
        predicates=predicates,
        properties={
            k: v for k, v in cfg.options().items() if k != "url"
        },
    )


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
