"""SQL dialect layer for JDBC sources/sinks: MySQL, PostgreSQL,
ClickHouse.

The reference hard-wires exactly one pair — MySQL in, ClickHouse out —
with DDL generation in ``/root/reference/src/schema_converter.py``
(CREATE TABLE :56-80, CDC variant :85-122, ``_live`` view :124-138)
and identifier quoting scattered through both clients.  This module
generalizes that into ``Dialect`` objects so the same pipeline can
read from / write to any of the three engines; everything is pure
string generation over Spark ``StructType`` schemas, so it unit-tests
without a live database (the harness has none), and the strings are
exactly what ``foreachBatch`` would execute over JDBC in production.

Identifier safety: every name is validated (``validate_identifier``,
parity with the reference's regex guard at
``/root/reference/src/mysql_client.py:14-32``) and then quoted with
the dialect's quote character — both layers, same as the reference.

Upsert strategies differ by engine and are the interesting part:

* **ClickHouse** — no upsert; the reference's design IS the answer:
  append new row versions into ``ReplacingMergeTree(_version)`` and
  resolve at read (merge-on-read).  ``upsert_sql`` is a plain INSERT.
* **MySQL** — ``INSERT ... ON DUPLICATE KEY UPDATE`` (merge-on-write).
* **PostgreSQL** — ``INSERT ... ON CONFLICT (pk) DO UPDATE`` .
"""

from __future__ import annotations

from dataclasses import dataclass

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

from ..schema.mysql_types import DELETED_COL, VERSION_COL, validate_identifier


@dataclass(frozen=True)
class Dialect:
    """One target engine's SQL surface. Subclass-free: behavior that
    differs is data (maps/templates) or small overridable methods."""

    name: str = "ansi"
    driver: str = ""
    url_prefix: str = "jdbc:"
    quote_char: str = '"'
    # ALTER TABLE ... ADD COLUMN IF NOT EXISTS support: Postgres and
    # ClickHouse have it; MySQL 8 does not, so replaying the evolution
    # step there raises a duplicate-column error.  The executor of the
    # statement owns making that idempotent: treat the error codes in
    # ``duplicate_column_errcodes`` as success (MySQL 1060 =
    # ER_DUP_FIELDNAME) — add_column_ddl's docstring restates this,
    # and a test pins the codes.
    add_column_if_not_exists: bool = False
    duplicate_column_errcodes: tuple[int, ...] = ()

    # ---------------------------------------------------------- identifiers

    def quote(self, ident: str) -> str:
        validate_identifier(ident, f"{self.name} identifier")
        q = self.quote_char
        return f"{q}{ident}{q}"

    def qualified(self, db: str, table: str) -> str:
        return f"{self.quote(db)}.{self.quote(table)}"

    # ---------------------------------------------------------- types

    def ddl_type(self, dt: DataType) -> str:
        raise NotImplementedError

    def column_ddl(self, f: StructField) -> str:
        return f"{self.quote(f.name)} {self.ddl_type(f.dataType)}" + (
            "" if f.nullable else " NOT NULL"
        )

    # ---------------------------------------------------------- DDL

    def create_table(
        self,
        db: str,
        table: str,
        schema: StructType,
        pks: tuple[str, ...] = (),
    ) -> str:
        cols = ",\n  ".join(self.column_ddl(f) for f in schema.fields)
        pk = (
            f",\n  PRIMARY KEY ({', '.join(self.quote(p) for p in pks)})"
            if pks
            else ""
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.qualified(db, table)} (\n"
            f"  {cols}{pk}\n)"
        )

    def add_column_ddl(self, db: str, table: str, f: StructField) -> str:
        """Target-side half of additive schema evolution (pairs with
        ``CDCStreamPipeline.evolve_schema``, which widens the decode
        side): ALTER TABLE ... ADD COLUMN for the new field.  The same
        constraint applies for the same reason — the column must be
        nullable, because existing target rows have no value to
        backfill.  Dialects with IF NOT EXISTS emit it so replays of
        the evolution step are idempotent; for dialects without it
        (MySQL 8), the statement's EXECUTOR must treat the engine's
        duplicate-column error codes (``duplicate_column_errcodes``,
        MySQL 1060) as success — this module only generates strings,
        so the absorption necessarily lives with whoever runs them."""
        if not f.nullable:
            raise ValueError(
                f"new column {f.name!r} must be nullable: existing "
                "target rows have no value to backfill"
            )
        ine = "IF NOT EXISTS " if self.add_column_if_not_exists else ""
        return (
            f"ALTER TABLE {self.qualified(db, table)} "
            f"ADD COLUMN {ine}{self.column_ddl(f)}"
        )

    def modify_column_type_ddl(
        self, db: str, table: str, f: StructField
    ) -> str:
        """Target-side half of TYPE-WIDENING evolution (pairs with
        ``validate_additive_evolution``'s safe-widening acceptance:
        byte/short/int -> wider integral, float -> double).  MySQL and
        ClickHouse both spell it MODIFY COLUMN; Postgres overrides
        with ALTER COLUMN ... TYPE.  Widening is idempotent by nature
        — re-running MODIFY to the already-current type is a no-op on
        every engine here, so no IF NOT EXISTS analogue is needed."""
        return (
            f"ALTER TABLE {self.qualified(db, table)} "
            f"MODIFY COLUMN {self.column_ddl(f)}"
        )

    # ---------------------------------------------------------- DML

    def insert_sql(self, db: str, table: str, columns: list[str]) -> str:
        cols = ", ".join(self.quote(c) for c in columns)
        params = ", ".join("?" for _ in columns)
        return (
            f"INSERT INTO {self.qualified(db, table)} ({cols}) "
            f"VALUES ({params})"
        )

    def upsert_sql(
        self, db: str, table: str, columns: list[str], pks: tuple[str, ...]
    ) -> str:
        raise NotImplementedError


class MySQLDialect(Dialect):
    def __init__(self) -> None:
        super().__init__(
            name="mysql",
            driver="com.mysql.cj.jdbc.Driver",
            url_prefix="jdbc:mysql://",
            quote_char="`",
            duplicate_column_errcodes=(1060,),  # ER_DUP_FIELDNAME
        )

    def ddl_type(self, dt: DataType) -> str:
        if isinstance(dt, DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        m = {
            ByteType: "TINYINT",
            ShortType: "SMALLINT",
            IntegerType: "INT",
            LongType: "BIGINT",
            FloatType: "FLOAT",
            DoubleType: "DOUBLE",
            BooleanType: "BOOLEAN",
            DateType: "DATE",
            TimestampType: "DATETIME(6)",
            StringType: "TEXT",
            BinaryType: "BLOB",
        }
        if type(dt) in m:
            return m[type(dt)]
        raise ValueError(f"no mysql DDL type for {dt}")

    def upsert_sql(
        self, db: str, table: str, columns: list[str], pks: tuple[str, ...]
    ) -> str:
        if not pks:
            raise ValueError("upsert needs primary keys")
        non_pk = [c for c in columns if c not in pks]
        if not non_pk:
            return self.insert_sql(db, table, columns).replace(
                "INSERT INTO", "INSERT IGNORE INTO", 1
            )
        sets = ", ".join(
            f"{self.quote(c)} = VALUES({self.quote(c)})" for c in non_pk
        )
        return (
            self.insert_sql(db, table, columns)
            + f" ON DUPLICATE KEY UPDATE {sets}"
        )


class PostgresDialect(Dialect):
    def __init__(self) -> None:
        super().__init__(
            name="postgresql",
            driver="org.postgresql.Driver",
            url_prefix="jdbc:postgresql://",
            quote_char='"',
            add_column_if_not_exists=True,
        )

    def ddl_type(self, dt: DataType) -> str:
        if isinstance(dt, DecimalType):
            return f"NUMERIC({dt.precision},{dt.scale})"
        m = {
            ByteType: "SMALLINT",  # no 1-byte int in PG
            ShortType: "SMALLINT",
            IntegerType: "INTEGER",
            LongType: "BIGINT",
            FloatType: "REAL",
            DoubleType: "DOUBLE PRECISION",
            BooleanType: "BOOLEAN",
            DateType: "DATE",
            TimestampType: "TIMESTAMP",
            StringType: "TEXT",
            BinaryType: "BYTEA",
        }
        if type(dt) in m:
            return m[type(dt)]
        raise ValueError(f"no postgresql DDL type for {dt}")

    def modify_column_type_ddl(
        self, db: str, table: str, f: StructField
    ) -> str:
        # Postgres has no MODIFY COLUMN; the type change is ALTER
        # COLUMN ... TYPE (nullability is a separate ALTER there, and
        # widening never changes it)
        return (
            f"ALTER TABLE {self.qualified(db, table)} "
            f"ALTER COLUMN {self.quote(f.name)} "
            f"TYPE {self.ddl_type(f.dataType)}"
        )

    def upsert_sql(
        self, db: str, table: str, columns: list[str], pks: tuple[str, ...]
    ) -> str:
        if not pks:
            raise ValueError("upsert needs primary keys")
        non_pk = [c for c in columns if c not in pks]
        conflict = ", ".join(self.quote(p) for p in pks)
        base = self.insert_sql(db, table, columns)
        if not non_pk:
            return f"{base} ON CONFLICT ({conflict}) DO NOTHING"
        sets = ", ".join(
            f"{self.quote(c)} = EXCLUDED.{self.quote(c)}" for c in non_pk
        )
        return f"{base} ON CONFLICT ({conflict}) DO UPDATE SET {sets}"


class ClickHouseDialect(Dialect):
    """Parity target: the DDL this emits matches the shape of
    ``/root/reference/src/schema_converter.py`` (Nullable wrap :51-54,
    MergeTree ORDER BY :65-77, ReplacingMergeTree + system columns
    :85-122, ``_live`` view :124-138)."""

    def __init__(self) -> None:
        super().__init__(
            name="clickhouse",
            driver="com.clickhouse.jdbc.ClickHouseDriver",
            url_prefix="jdbc:clickhouse://",
            quote_char="`",
            add_column_if_not_exists=True,
        )

    def ddl_type(self, dt: DataType) -> str:
        if isinstance(dt, DecimalType):
            return f"Decimal({dt.precision},{dt.scale})"
        m = {
            ByteType: "Int8",
            ShortType: "Int16",
            IntegerType: "Int32",
            LongType: "Int64",
            FloatType: "Float32",
            DoubleType: "Float64",
            BooleanType: "Bool",
            DateType: "Date",
            TimestampType: "DateTime64(6)",
            StringType: "String",
            BinaryType: "String",  # parity: blobs land as String
        }
        if type(dt) in m:
            return m[type(dt)]
        raise ValueError(f"no clickhouse DDL type for {dt}")

    def column_ddl(self, f: StructField) -> str:
        # ClickHouse spells nullability as a type wrapper, and sort-key
        # columns must stay non-Nullable (reference :51-54 wraps
        # everything except PKs the same way).
        t = self.ddl_type(f.dataType)
        if f.nullable:
            t = f"Nullable({t})"
        return f"{self.quote(f.name)} {t}"

    def _order_by(self, schema: StructType, pks: tuple[str, ...]) -> str:
        # PKs -> first column -> tuple() (reference :65-69 fallback chain)
        if pks:
            return ", ".join(self.quote(p) for p in pks)
        if schema.fields:
            return self.quote(schema.fields[0].name)
        return "tuple()"

    def create_table(
        self,
        db: str,
        table: str,
        schema: StructType,
        pks: tuple[str, ...] = (),
    ) -> str:
        fields = [
            StructField(f.name, f.dataType, f.nullable and f.name not in pks)
            for f in schema.fields
        ]
        cols = ",\n  ".join(self.column_ddl(f) for f in fields)
        return (
            f"CREATE TABLE IF NOT EXISTS {self.qualified(db, table)} (\n"
            f"  {cols}\n) ENGINE = MergeTree()\n"
            f"ORDER BY ({self._order_by(schema, pks)})"
        )

    def create_cdc_table(
        self,
        db: str,
        table: str,
        schema: StructType,
        pks: tuple[str, ...] = (),
    ) -> str:
        """ReplacingMergeTree(_version) + (_version, _deleted) system
        columns — the reference's CDC table (:85-122)."""
        fields = [
            StructField(f.name, f.dataType, f.nullable and f.name not in pks)
            for f in schema.fields
        ]
        cols = ",\n  ".join(self.column_ddl(f) for f in fields)
        return (
            f"CREATE TABLE IF NOT EXISTS {self.qualified(db, table)} (\n"
            f"  {cols},\n"
            f"  {self.quote(VERSION_COL)} UInt64,\n"
            f"  {self.quote(DELETED_COL)} UInt8 DEFAULT 0\n"
            f") ENGINE = ReplacingMergeTree({self.quote(VERSION_COL)})\n"
            f"ORDER BY ({self._order_by(schema, pks)})"
        )

    def create_live_view(
        self, db: str, table: str, user_columns: list[str]
    ) -> str:
        """``<t>_live``: FINAL + tombstone filter + user-column
        projection (:124-138)."""
        validate_identifier(table, "table")
        cols = ", ".join(self.quote(c) for c in user_columns)
        return (
            f"CREATE OR REPLACE VIEW {self.qualified(db, table + '_live')} "
            f"AS SELECT {cols} FROM {self.qualified(db, table)} FINAL "
            f"WHERE {self.quote(DELETED_COL)} = 0"
        )

    def upsert_sql(
        self, db: str, table: str, columns: list[str], pks: tuple[str, ...]
    ) -> str:
        # Merge-on-read: append a new version; ReplacingMergeTree +
        # FINAL resolves.  Identical contract to our cdc_apply +
        # dedup_latest pair.
        return self.insert_sql(db, table, columns)


DIALECTS: dict[str, Dialect] = {
    d.name: d
    for d in (MySQLDialect(), PostgresDialect(), ClickHouseDialect())
}


def get_dialect(name: str) -> Dialect:
    try:
        return DIALECTS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown dialect {name!r}; have {sorted(DIALECTS)}"
        ) from None
