from .changelog import ORDERS_PK, derive_orders_changelog
from .dialects import (
    DIALECTS,
    ClickHouseDialect,
    Dialect,
    MySQLDialect,
    PostgresDialect,
    get_dialect,
)
from .parquet import TABLES, load_table, register_tables

__all__ = [
    "DIALECTS",
    "ClickHouseDialect",
    "Dialect",
    "MySQLDialect",
    "ORDERS_PK",
    "PostgresDialect",
    "TABLES",
    "derive_orders_changelog",
    "get_dialect",
    "load_table",
    "register_tables",
]
