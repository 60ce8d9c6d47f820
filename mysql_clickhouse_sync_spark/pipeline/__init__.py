from .snapshot import SnapshotReplicator, TableResult

__all__ = ["SnapshotReplicator", "TableResult"]
