"""MySQL type system -> Spark ``StructType`` mapping.

Parity target: the reference's type map and DDL generator
(``/root/reference/src/schema_converter.py:3-54`` — 33 MySQL primitive
types -> ClickHouse types, decimal precision/scale handling, unknown
types falling back to String, ``Nullable(...)`` wrapping) and its
schema-introspection objects ``ColumnInfo``/``TableSchema``
(``/root/reference/src/mysql_client.py:35-51``).

Improvements over the reference (documented gaps in its README):

* UNSIGNED integer types are detected and widened one tier so they
  cannot overflow (the reference maps them signed, README.md:590).
* ``binary``/``varbinary``/``*blob`` map to ``BinaryType`` instead of
  losing binary-ness to String.

The CDC variant appends the two system columns the reference adds to
every replicated table (``/root/reference/src/schema_converter.py:102-103``):
``_version`` (event version, LongType — microsecond timestamp in the
reference) and ``_deleted`` (soft-delete flag, IntegerType).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VERSION_COL = "_version"
DELETED_COL = "_deleted"

# Identifier guard retained for any spark.sql() string surface
# (parity: /root/reference/src/mysql_client.py:14-32).
_IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def validate_identifier(name: str, kind: str = "identifier") -> str:
    """Reject identifiers that could smuggle SQL into string surfaces."""
    if not isinstance(name, str) or not _IDENT_RE.match(name):
        raise ValueError(f"invalid {kind}: {name!r}")
    return name


@dataclass(frozen=True)
class ColumnSpec:
    """Introspected source column (parity: ColumnInfo,
    /root/reference/src/mysql_client.py:35-44)."""

    name: str
    data_type: str                      # lowercase MySQL type name
    is_nullable: bool = True
    column_key: str = ""                # "PRI" | "UNI" | "MUL" | ""
    extra: str = ""                     # e.g. "auto_increment"
    character_maximum_length: int | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None
    is_unsigned: bool = False


@dataclass(frozen=True)
class TableSpec:
    """Introspected source table (parity: TableSchema,
    /root/reference/src/mysql_client.py:47-51)."""

    name: str
    columns: tuple[ColumnSpec, ...]
    primary_keys: tuple[str, ...] = field(default_factory=tuple)

    def sort_key(self) -> tuple[str, ...]:
        """Physical clustering key: PKs, else first column, else none
        (parity: /root/reference/src/schema_converter.py:65-69)."""
        if self.primary_keys:
            return self.primary_keys
        if self.columns:
            return (self.columns[0].name,)
        return ()


# MySQL type name -> Spark type constructor.  Parity with the 33-entry
# map at /root/reference/src/schema_converter.py:3-37 (see SURVEY.md
# §2.3 for the three-way MySQL/ClickHouse/Spark table).
_SIGNED_INT = {
    "tinyint": ByteType,
    "smallint": ShortType,
    "mediumint": IntegerType,
    "int": IntegerType,
    "integer": IntegerType,
    "bigint": LongType,
}
# UNSIGNED fix: widen one tier so the full unsigned range fits.
_UNSIGNED_INT = {
    "tinyint": ShortType,
    "smallint": IntegerType,
    "mediumint": IntegerType,
    "int": LongType,
    "integer": LongType,
    "bigint": DecimalType,  # bigint unsigned needs Decimal(20,0)
}
_SIMPLE = {
    "float": FloatType,
    "double": DoubleType,
    "real": DoubleType,
    "bit": LongType,
    "bool": BooleanType,
    "boolean": BooleanType,
    "date": DateType,
    "datetime": TimestampType,
    "timestamp": TimestampType,
    "time": StringType,
    "year": IntegerType,
    "char": StringType,
    "varchar": StringType,
    "tinytext": StringType,
    "text": StringType,
    "mediumtext": StringType,
    "longtext": StringType,
    "enum": StringType,
    "set": StringType,
    "json": StringType,
}
_BINARY = {"binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"}


def mysql_type_to_spark(col: ColumnSpec) -> DataType:
    """Map one MySQL column type to a Spark DataType.

    Mirrors convert_type at /root/reference/src/schema_converter.py:39-54:
    decimal keeps (precision, scale) with a (10, 0) default; unknown
    types fall back to String.  Nullability lives on the StructField,
    not the type (Spark convention), handled in table_struct_type.
    """
    t = col.data_type.strip().lower()
    # Strip any display width / enum body: "int(11)" -> "int".
    base = t.split("(", 1)[0].strip()

    if base in ("decimal", "numeric", "dec", "fixed"):
        precision = col.numeric_precision if col.numeric_precision else 10
        scale = col.numeric_scale if col.numeric_scale is not None else 0
        return DecimalType(precision, scale)

    if base in _SIGNED_INT:
        if col.is_unsigned:
            ctor = _UNSIGNED_INT[base]
            return DecimalType(20, 0) if ctor is DecimalType else ctor()
        return _SIGNED_INT[base]()

    if base in _BINARY:
        return BinaryType()

    if base in _SIMPLE:
        return _SIMPLE[base]()

    # Unknown -> String (parity: /root/reference/src/schema_converter.py:49)
    return StringType()


def table_struct_type(spec: TableSpec) -> StructType:
    """TableSpec -> StructType, preserving declared column order and
    nullability (parity: Nullable(...) wrap,
    /root/reference/src/schema_converter.py:51-52)."""
    return StructType(
        [
            StructField(c.name, mysql_type_to_spark(c), c.is_nullable)
            for c in spec.columns
        ]
    )


def cdc_struct_type(spec: TableSpec) -> StructType:
    """CDC table schema: user columns + (_version, _deleted) system
    columns (parity: /root/reference/src/schema_converter.py:85-122)."""
    base = table_struct_type(spec)
    return StructType(
        list(base.fields)
        + [
            StructField(VERSION_COL, LongType(), False),
            StructField(DELETED_COL, IntegerType(), False),
        ]
    )
