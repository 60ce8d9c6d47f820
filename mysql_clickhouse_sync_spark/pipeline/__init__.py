from .compact import (
    CompactionPolicy,
    CompactionResult,
    compact_cdc_table,
    execute_compaction,
    list_data_files,
    plan_compaction,
    plan_table_compaction,
    should_compact,
)
from .snapshot import SnapshotReplicator, TableResult

__all__ = [
    "CompactionPolicy",
    "CompactionResult",
    "SnapshotReplicator",
    "TableResult",
    "compact_cdc_table",
    "execute_compaction",
    "list_data_files",
    "plan_compaction",
    "plan_table_compaction",
    "should_compact",
]
