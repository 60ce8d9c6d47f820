"""Catalog DDL lifecycle: create db/table (snapshot + CDC variants),
probe, insert/truncate, drop — the reference's S1/S8-S13 operators."""

from __future__ import annotations

import pytest

from mysql_clickhouse_sync_spark.schema.mysql_types import (
    ColumnSpec,
    TableSpec,
)
from mysql_clickhouse_sync_spark.sources import catalog as cat

SPEC = TableSpec(
    name="users_cat",
    columns=(
        ColumnSpec("id", "bigint", is_nullable=False, column_key="PRI"),
        ColumnSpec("email", "varchar", character_maximum_length=255),
        ColumnSpec("balance", "decimal", numeric_precision=10, numeric_scale=2),
    ),
    primary_keys=("id",),
)


@pytest.fixture(scope="module")
def db(spark):
    cat.create_database(spark, "cat_test")
    yield "cat_test"
    spark.sql("DROP DATABASE IF EXISTS cat_test CASCADE")


def test_create_probe_truncate_drop(spark, db):
    assert not cat.table_exists(spark, db, "users_cat")
    cat.create_table(spark, SPEC, db)
    assert cat.table_exists(spark, db, "users_cat")
    assert "users_cat" in cat.list_tables(spark, db)

    spark.sql(
        f"INSERT INTO {db}.users_cat VALUES (1, 'a@x', CAST(1.50 AS DECIMAL(10,2)))"
    )
    assert spark.table(f"{db}.users_cat").count() == 1
    cat.truncate_table(spark, db, "users_cat")
    assert spark.table(f"{db}.users_cat").count() == 0

    cat.drop_table(spark, db, "users_cat")
    assert not cat.table_exists(spark, db, "users_cat")


def test_cdc_table_has_system_columns(spark, db):
    cat.create_table(spark, SPEC, db, cdc=True)
    cols = [f.name for f in spark.table(f"{db}.users_cat").schema.fields]
    assert cols == ["id", "email", "balance", "_version", "_deleted"]
    cat.drop_table(spark, db, "users_cat")


def test_ddl_string_shape():
    ddl = cat.generate_create_table(SPEC, "mydb")
    assert "mydb.users_cat" in ddl
    assert "id bigint NOT NULL" in ddl
    assert "balance decimal(10,2)" in ddl
    assert "'sort_key' = 'id'" in ddl


def test_injection_rejected(spark):
    with pytest.raises(ValueError):
        cat.drop_table(spark, "x; DROP TABLE y", "t")
    with pytest.raises(ValueError):
        cat.create_database(spark, "db`x")
