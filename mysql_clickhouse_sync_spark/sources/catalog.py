"""Catalog DDL surface: the reference's database/table lifecycle
operators re-expressed against the Spark session catalog.

Parity (SURVEY.md §2.1): S1 table discovery, S8 create database,
S9/S10 create table (snapshot / CDC variants), S11 drop + truncate,
S13 existence probe.  The reference emits ClickHouse DDL strings
(``/root/reference/src/schema_converter.py:56-122``) and probes
``system.tables`` (``/root/reference/src/clickhouse_client.py:71-79``);
here tables are parquet-backed catalog tables, and every identifier
passes the same anti-injection guard the reference applies
(``/root/reference/src/mysql_client.py:14-32``) because this IS a SQL
string surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schema.mysql_types import (
    TableSpec,
    cdc_struct_type,
    table_struct_type,
    validate_identifier,
)


def create_database(spark: SparkSession, db: str) -> None:
    """S8 (parity: /root/reference/src/clickhouse_client.py:63-66)."""
    validate_identifier(db, "database")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def generate_create_table(spec: TableSpec, db: str, cdc: bool = False) -> str:
    """DDL string for a managed parquet table (S9; CDC variant S10 adds
    the ``_version``/``_deleted`` system columns).

    The reference's ``ORDER BY (pks)`` clustering has no DDL slot in
    Spark — it is applied at write time via ``sortWithinPartitions``
    (pipeline/snapshot.py); here the sort key is recorded as a table
    property so downstream writers can honor it.
    """
    validate_identifier(db, "database")
    validate_identifier(spec.name, "table")
    struct = cdc_struct_type(spec) if cdc else table_struct_type(spec)
    cols = ",\n  ".join(
        f"{validate_identifier(f.name, 'column')} {f.dataType.simpleString()}"
        + ("" if f.nullable else " NOT NULL")
        for f in struct.fields
    )
    sort_key = ",".join(spec.sort_key())
    return (
        f"CREATE TABLE IF NOT EXISTS {db}.{spec.name} (\n  {cols}\n)\n"
        f"USING PARQUET\n"
        f"TBLPROPERTIES ('sort_key' = '{sort_key}')"
    )


def create_table(
    spark: SparkSession, spec: TableSpec, db: str, cdc: bool = False
) -> None:
    spark.sql(generate_create_table(spec, db, cdc))


def drop_table(spark: SparkSession, db: str, table: str) -> None:
    """S11 (parity: /root/reference/src/schema_converter.py:82-83)."""
    validate_identifier(db, "database")
    validate_identifier(table, "table")
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")


def truncate_table(spark: SparkSession, db: str, table: str) -> None:
    """S11 (parity: /root/reference/src/clickhouse_client.py:107-112)."""
    validate_identifier(db, "database")
    validate_identifier(table, "table")
    spark.sql(f"TRUNCATE TABLE {db}.{table}")


def table_exists(spark: SparkSession, db: str, table: str) -> bool:
    """S13 (parity: /root/reference/src/clickhouse_client.py:71-79)."""
    validate_identifier(db, "database")
    validate_identifier(table, "table")
    return spark.catalog.tableExists(f"{db}.{table}")


def list_tables(spark: SparkSession, db: str) -> list[str]:
    """S1 (parity: SHOW TABLES, /root/reference/src/mysql_client.py:86-89)."""
    validate_identifier(db, "database")
    return [t.name for t in spark.catalog.listTables(db)]
