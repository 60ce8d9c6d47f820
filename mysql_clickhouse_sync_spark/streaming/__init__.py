from .cdc_pipeline import CDCStreamPipeline, run_initial_sync_then_stream
from .multi_table import MUX_SCHEMA, MultiTableCDCStream

__all__ = [
    "CDCStreamPipeline",
    "run_initial_sync_then_stream",
    "MultiTableCDCStream",
    "MUX_SCHEMA",
]
