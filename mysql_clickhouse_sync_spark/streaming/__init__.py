from .cdc_pipeline import (
    CDCStreamPipeline,
    run_initial_sync_then_stream,
    run_stream_with_restart,
)
from .multi_table import MUX_SCHEMA, MultiTableCDCStream
from .progress import ProgressLogger, attach_progress_logger

__all__ = [
    "CDCStreamPipeline",
    "run_initial_sync_then_stream",
    "run_stream_with_restart",
    "MultiTableCDCStream",
    "MUX_SCHEMA",
    "ProgressLogger",
    "attach_progress_logger",
]
