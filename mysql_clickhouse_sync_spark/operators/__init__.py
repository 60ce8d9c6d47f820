from .cdc import (
    stamp_changelog,
    cdc_apply,
    dedup_latest,
    live_view,
    compact,
    register_live_view,
)
from .verify import verify_counts, verify_diff, table_checksum

__all__ = [
    "stamp_changelog",
    "cdc_apply",
    "dedup_latest",
    "live_view",
    "compact",
    "register_live_view",
    "verify_counts",
    "verify_diff",
    "table_checksum",
]
