from .parquet import TABLES, load_table, register_tables
from .changelog import derive_orders_changelog, ORDERS_PK

__all__ = [
    "TABLES",
    "load_table",
    "register_tables",
    "derive_orders_changelog",
    "ORDERS_PK",
]
