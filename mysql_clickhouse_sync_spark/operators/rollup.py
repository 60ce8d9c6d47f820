"""Incremental (continuous) rollup: hypertable-style materialized
aggregates maintained from increments instead of full recomputes.

The reference materializes nothing (its views are merge-on-read); at
100 TB a per-(bucket, key) rollup over an append-only event table is
the operator that keeps dashboards O(buckets) instead of O(events).
The trick is storing MERGEABLE partial state — (count, sum, min, max)
merge associatively, avg derives at read time — so each refresh
aggregates only the new slice and merges it with the stored state:

    state_t = merge(state_{t-1}, partials(new_events))

Exactly Spark's own partial-aggregation model, lifted to storage.
Late data is handled structurally: a late event lands in its (old)
bucket at the next merge — no watermark needed for correctness, only
for bounding how far back refreshes rewrite.

Scale notes: both sides of ``rollup_merge`` are already keyed by
(bucket, keys); written bucketed-by-key (pipeline/layout.py) the merge
is a co-partitioned join-free groupBy.  The increment never rescans
the base table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_events", "sum_value", "min_value", "max_value")


def rollup_increment(
    events: DataFrame,
    bucket: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Partial aggregate state for one slice of events."""
    return (
        events.groupBy(
            F.window(ts_col, bucket)["start"].alias("bucket_start"), *keys
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def rollup_merge(state: DataFrame, increment: DataFrame) -> DataFrame:
    """Merge two partial-state relations (associative + commutative)."""
    keys = [c for c in state.columns if c not in STATE_COLS]
    return (
        state.unionByName(increment)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_read(state: DataFrame) -> DataFrame:
    """Read view: derive non-mergeable aggregates (avg) from state."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        (F.col("sum_value").cast("double") / F.col("n_events")).alias(
            "avg_value"
        ),
    )
