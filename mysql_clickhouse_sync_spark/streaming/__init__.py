from .cdc_pipeline import CDCStreamPipeline, run_initial_sync_then_stream

__all__ = ["CDCStreamPipeline", "run_initial_sync_then_stream"]
