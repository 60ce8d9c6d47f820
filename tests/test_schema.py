"""Type-system tests mirroring the reference's
tests/test_schema_converter.py (SURVEY.md §5): per-type conversion,
decimal p/s, nullability, unknown fallback, CDC system columns,
sort-key fallback chain, identifier guard."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

from mysql_clickhouse_sync_spark.schema import (
    ColumnSpec,
    TableSpec,
    cdc_struct_type,
    mysql_type_to_spark,
    table_struct_type,
    validate_identifier,
)

# Mirrors the completeness matrix at
# /root/reference/tests/test_schema_converter.py:273-289 + FIXTURES.md §4.
TYPE_MATRIX = [
    ("tinyint", ByteType()),
    ("smallint", ShortType()),
    ("mediumint", IntegerType()),
    ("int", IntegerType()),
    ("integer", IntegerType()),
    ("bigint", LongType()),
    ("float", FloatType()),
    ("double", DoubleType()),
    ("bit", LongType()),
    ("bool", BooleanType()),
    ("boolean", BooleanType()),
    ("date", DateType()),
    ("datetime", TimestampType()),
    ("timestamp", TimestampType()),
    ("time", StringType()),
    ("year", IntegerType()),
    ("char", StringType()),
    ("varchar", StringType()),
    ("tinytext", StringType()),
    ("text", StringType()),
    ("mediumtext", StringType()),
    ("longtext", StringType()),
    ("binary", BinaryType()),
    ("varbinary", BinaryType()),
    ("tinyblob", BinaryType()),
    ("blob", BinaryType()),
    ("mediumblob", BinaryType()),
    ("longblob", BinaryType()),
    ("enum", StringType()),
    ("set", StringType()),
    ("json", StringType()),
]


@pytest.mark.parametrize("mysql_type,expected", TYPE_MATRIX)
def test_type_map(mysql_type, expected):
    assert mysql_type_to_spark(ColumnSpec("c", mysql_type)) == expected


def test_decimal_precision_scale():
    c = ColumnSpec("d", "decimal", numeric_precision=18, numeric_scale=4)
    assert mysql_type_to_spark(c) == DecimalType(18, 4)


def test_decimal_default_10_0():
    # parity: /root/reference/src/schema_converter.py:44-47
    assert mysql_type_to_spark(ColumnSpec("d", "decimal")) == DecimalType(10, 0)


def test_unknown_type_falls_back_to_string():
    # parity: /root/reference/src/schema_converter.py:49
    assert mysql_type_to_spark(ColumnSpec("x", "geometry")) == StringType()


def test_display_width_stripped():
    assert mysql_type_to_spark(ColumnSpec("i", "int(11)")) == IntegerType()


def test_unsigned_widening():
    # improvement over the reference's documented UNSIGNED gap
    # (/root/reference/README.md:590)
    assert mysql_type_to_spark(
        ColumnSpec("i", "int", is_unsigned=True)
    ) == LongType()
    assert mysql_type_to_spark(
        ColumnSpec("i", "tinyint", is_unsigned=True)
    ) == ShortType()
    assert mysql_type_to_spark(
        ColumnSpec("i", "bigint", is_unsigned=True)
    ) == DecimalType(20, 0)


def _users_spec() -> TableSpec:
    # FIXTURES.md §1 (the reference's canonical test table).
    return TableSpec(
        "users",
        (
            ColumnSpec("id", "int", is_nullable=False, column_key="PRI"),
            ColumnSpec("email", "varchar", is_nullable=False, column_key="UNI"),
            ColumnSpec("name", "varchar", is_nullable=True),
            ColumnSpec("balance", "decimal", is_nullable=True,
                       numeric_precision=10, numeric_scale=2),
            ColumnSpec("created_at", "datetime", is_nullable=False),
        ),
        primary_keys=("id",),
    )


def test_table_struct_nullability_and_order():
    st = table_struct_type(_users_spec())
    assert [f.name for f in st.fields] == [
        "id", "email", "name", "balance", "created_at",
    ]
    assert st["id"].nullable is False
    assert st["name"].nullable is True
    assert st["balance"].dataType == DecimalType(10, 2)


def test_cdc_struct_appends_system_columns():
    # parity: /root/reference/src/schema_converter.py:102-103
    st = cdc_struct_type(_users_spec())
    assert [f.name for f in st.fields][-2:] == ["_version", "_deleted"]
    assert st["_version"].dataType == LongType()
    assert st["_version"].nullable is False


def test_sort_key_fallback_chain():
    # parity: /root/reference/src/schema_converter.py:65-69
    assert _users_spec().sort_key() == ("id",)
    no_pk = TableSpec(
        "logs",
        (ColumnSpec("message", "text"), ColumnSpec("timestamp", "datetime")),
    )
    assert no_pk.sort_key() == ("message",)
    composite = TableSpec(
        "order_items",
        (
            ColumnSpec("order_id", "int", is_nullable=False, column_key="PRI"),
            ColumnSpec("product_id", "int", is_nullable=False, column_key="PRI"),
            ColumnSpec("quantity", "int", is_nullable=False),
        ),
        primary_keys=("order_id", "product_id"),
    )
    assert composite.sort_key() == ("order_id", "product_id")


@pytest.mark.parametrize(
    "bad",
    ["users; DROP TABLE x", "users--", "1users", "us ers", "", "us.ers"],
)
def test_identifier_guard_rejects(bad):
    # parity: /root/reference/src/mysql_client.py:14-32 (injection guard)
    with pytest.raises(ValueError):
        validate_identifier(bad)


def test_identifier_guard_accepts():
    assert validate_identifier("users_2") == "users_2"
    assert validate_identifier("_tmp") == "_tmp"
