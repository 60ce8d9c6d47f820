"""Dialect DDL/DML generation tests — pure string assertions, no
database.  The ClickHouse strings are checked against the shapes the
reference generates (/root/reference/src/schema_converter.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mysql_clickhouse_sync_spark.sources.dialects import (
    DIALECTS,
    get_dialect,
)
from mysql_clickhouse_sync_spark.sources.jdbc import JdbcSourceConfig

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("price", DecimalType(12, 2), True),
        StructField("score", DoubleType(), True),
        StructField("created", TimestampType(), True),
    ]
)


def test_registry_and_drivers():
    assert set(DIALECTS) == {"mysql", "postgresql", "clickhouse"}
    assert get_dialect("MySQL").driver == "com.mysql.cj.jdbc.Driver"
    assert get_dialect("postgresql").driver == "org.postgresql.Driver"
    with pytest.raises(ValueError, match="unknown dialect"):
        get_dialect("oracle")


def test_mysql_create_and_upsert():
    d = get_dialect("mysql")
    ddl = d.create_table("shop", "items", SCHEMA, pks=("id",))
    assert "CREATE TABLE IF NOT EXISTS `shop`.`items`" in ddl
    assert "`id` BIGINT NOT NULL" in ddl
    assert "`price` DECIMAL(12,2)" in ddl
    assert "`created` DATETIME(6)" in ddl
    assert "PRIMARY KEY (`id`)" in ddl
    up = d.upsert_sql("shop", "items", ["id", "name", "price"], ("id",))
    assert up == (
        "INSERT INTO `shop`.`items` (`id`, `name`, `price`) "
        "VALUES (?, ?, ?) ON DUPLICATE KEY UPDATE "
        "`name` = VALUES(`name`), `price` = VALUES(`price`)"
    )
    # all-PK rows degrade to INSERT IGNORE, not invalid SQL
    assert d.upsert_sql("shop", "items", ["id"], ("id",)).startswith(
        "INSERT IGNORE INTO"
    )


def test_postgres_create_and_upsert():
    d = get_dialect("postgresql")
    ddl = d.create_table("shop", "items", SCHEMA, pks=("id",))
    assert 'CREATE TABLE IF NOT EXISTS "shop"."items"' in ddl
    assert '"id" BIGINT NOT NULL' in ddl
    assert '"price" NUMERIC(12,2)' in ddl
    assert '"score" DOUBLE PRECISION' in ddl
    up = d.upsert_sql("shop", "items", ["id", "name"], ("id",))
    assert up.endswith(
        'ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name"'
    )
    assert "DO NOTHING" in d.upsert_sql("shop", "items", ["id"], ("id",))


def test_clickhouse_snapshot_table_matches_reference_shape():
    # parity: schema_converter.generate_create_table
    # (/root/reference/src/schema_converter.py:56-80)
    d = get_dialect("clickhouse")
    ddl = d.create_table("repl", "items", SCHEMA, pks=("id",))
    assert "CREATE TABLE IF NOT EXISTS `repl`.`items`" in ddl
    assert "`id` Int64" in ddl and "Nullable(Int64)" not in ddl
    assert "`name` Nullable(String)" in ddl
    assert "`price` Nullable(Decimal(12,2))" in ddl
    assert "`created` Nullable(DateTime64(6))" in ddl
    assert "ENGINE = MergeTree()" in ddl
    assert ddl.rstrip().endswith("ORDER BY (`id`)")


def test_clickhouse_cdc_table_and_live_view():
    # parity: generate_cdc_table (:85-122) + generate_cdc_view (:124-138)
    d = get_dialect("clickhouse")
    ddl = d.create_cdc_table("repl", "items", SCHEMA, pks=("id",))
    assert "`_version` UInt64" in ddl
    assert "`_deleted` UInt8 DEFAULT 0" in ddl
    assert "ENGINE = ReplacingMergeTree(`_version`)" in ddl
    assert ddl.rstrip().endswith("ORDER BY (`id`)")
    view = d.create_live_view("repl", "items", ["id", "name"])
    assert view == (
        "CREATE OR REPLACE VIEW `repl`.`items_live` AS "
        "SELECT `id`, `name` FROM `repl`.`items` FINAL "
        "WHERE `_deleted` = 0"
    )
    # ClickHouse upsert is append: merge-on-read owns resolution
    up = d.upsert_sql("repl", "items", ["id", "name"], ("id",))
    assert up.startswith("INSERT INTO") and "UPDATE" not in up


def test_order_by_fallback_chain():
    # PKs -> first column -> tuple() (reference :65-69)
    d = get_dialect("clickhouse")
    no_pk = d.create_table("db", "t", SCHEMA)
    assert no_pk.rstrip().endswith("ORDER BY (`id`)")
    empty = d.create_table("db", "t", StructType([]))
    assert empty.rstrip().endswith("ORDER BY (tuple())")


def test_identifier_injection_rejected_everywhere():
    for d in DIALECTS.values():
        with pytest.raises(ValueError):
            d.quote("x; DROP TABLE users--")
        with pytest.raises(ValueError):
            d.create_table("db", "t`bad", SCHEMA)
        with pytest.raises(ValueError):
            d.insert_sql("db", "t", ['a" or "1'])


def test_unsupported_type_raises():
    bad = StructType([StructField("v", ArrayType(IntegerType()), True)])
    for d in DIALECTS.values():
        with pytest.raises(ValueError, match="no .* DDL type"):
            d.create_table("db", "t", bad)


def test_jdbc_config_uses_dialect_driver():
    cfg = JdbcSourceConfig(
        url="jdbc:postgresql://h/db", user="u", password="p",
        dialect="postgresql",
    )
    assert cfg.options()["driver"] == "org.postgresql.Driver"


def test_jdbc_helpers_validate_identifiers():
    """probe/partitioned/hash-bucketed reads all reject injection
    before any connection is attempted (P7 retained on every SQL
    string surface)."""
    from mysql_clickhouse_sync_spark.sources.jdbc import (
        probe_bounds,
        read_table_predicates,
    )

    cfg = JdbcSourceConfig(url="jdbc:mysql://h/db", user="u", password="p")
    with pytest.raises(ValueError):
        probe_bounds(None, cfg, "t; DROP TABLE x", "id")
    with pytest.raises(ValueError):
        probe_bounds(None, cfg, "t", "id--")
    with pytest.raises(ValueError):
        read_table_predicates(None, cfg, "t", 'k" OR "1')


def test_jdbc_hash_bucket_expressions_per_dialect():
    """The source-side hash expression must match the target engine's
    SQL surface — snapshot of the three dialect forms."""
    import mysql_clickhouse_sync_spark.sources.jdbc as j

    captured = {}

    class FakeReader:
        def jdbc(self, url, table, predicates, properties):
            captured["predicates"] = predicates
            return "df"

    class FakeSpark:
        read = FakeReader()

    for dialect, frag in [
        ("mysql", "MOD(crc32(k), 4)"),
        ("postgresql", "MOD(abs(hashtext(k::text)), 4)"),
        ("clickhouse", "cityHash64(k) % 4"),
    ]:
        cfg = JdbcSourceConfig(
            url="jdbc:x://h/db", user="u", password="p",
            num_partitions=4, dialect=dialect,
        )
        assert (
            j.read_table_predicates(FakeSpark(), cfg, "t", "k") == "df"
        )
        preds = captured["predicates"]
        assert len(preds) == 4
        assert preds[0] == f"{frag} = 0"


def test_add_column_ddl_per_dialect():
    """Target-side half of additive schema evolution: ALTER ... ADD
    COLUMN per engine, IF NOT EXISTS only where the engine supports it
    (Postgres/ClickHouse yes; MySQL 8 no), non-nullable additions
    rejected for the same backfill reason evolve_schema rejects them."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField

    from mysql_clickhouse_sync_spark.sources.dialects import get_dialect

    f = StructField("phone", StringType(), True)
    assert get_dialect("mysql").add_column_ddl("db", "users", f) == (
        "ALTER TABLE `db`.`users` ADD COLUMN `phone` TEXT"
    )
    assert get_dialect("postgresql").add_column_ddl("db", "users", f) == (
        'ALTER TABLE "db"."users" ADD COLUMN IF NOT EXISTS "phone" TEXT'
    )
    ch = get_dialect("clickhouse").add_column_ddl("db", "users", f)
    assert ch.startswith(
        "ALTER TABLE `db`.`users` ADD COLUMN IF NOT EXISTS `phone` "
    )
    # ClickHouse wraps nullable columns in Nullable(...)
    assert "Nullable(String)" in ch

    bad = StructField("fax", LongType(), False)
    for name in ("mysql", "postgresql", "clickhouse"):
        with pytest.raises(ValueError, match="must be nullable"):
            get_dialect(name).add_column_ddl("db", "users", bad)


def test_duplicate_column_errcodes_contract():
    """MySQL lacks ADD COLUMN IF NOT EXISTS, so evolution replays
    there raise ER_DUP_FIELDNAME — the statement executor absorbs the
    pinned code as success; engines with IF NOT EXISTS need none."""
    from mysql_clickhouse_sync_spark.sources.dialects import get_dialect

    assert get_dialect("mysql").duplicate_column_errcodes == (1060,)
    assert not get_dialect("mysql").add_column_if_not_exists
    for name in ("postgresql", "clickhouse"):
        d = get_dialect(name)
        assert d.add_column_if_not_exists
        assert d.duplicate_column_errcodes == ()


def test_modify_column_type_ddl_per_dialect():
    """Target-side DDL for safe type widenings (pairs with
    validate_additive_evolution's widening acceptance)."""
    from pyspark.sql.types import LongType, StructField

    from mysql_clickhouse_sync_spark.sources.dialects import get_dialect

    f = StructField("qty", LongType(), True)
    assert get_dialect("mysql").modify_column_type_ddl(
        "db", "users", f
    ) == "ALTER TABLE `db`.`users` MODIFY COLUMN `qty` BIGINT"
    assert get_dialect("postgresql").modify_column_type_ddl(
        "db", "users", f
    ) == 'ALTER TABLE "db"."users" ALTER COLUMN "qty" TYPE BIGINT'
    ch = get_dialect("clickhouse").modify_column_type_ddl("db", "users", f)
    assert "MODIFY COLUMN" in ch and "qty" in ch
