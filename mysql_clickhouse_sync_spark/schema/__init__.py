from .mysql_types import (
    ColumnSpec,
    TableSpec,
    mysql_type_to_spark,
    table_struct_type,
    cdc_struct_type,
    validate_identifier,
    VERSION_COL,
    DELETED_COL,
)

__all__ = [
    "ColumnSpec",
    "TableSpec",
    "mysql_type_to_spark",
    "table_struct_type",
    "cdc_struct_type",
    "validate_identifier",
    "VERSION_COL",
    "DELETED_COL",
]
