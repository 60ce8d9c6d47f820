"""Mergeable sketches: count-min.

A training-data pipeline at 100 TB tracks per-key frequencies (URLs,
domains, users, n-grams) where exact per-key state is too large and
``approx_count_distinct`` answers the wrong question.  A count-min
sketch is a (depth x width) counter matrix: each key increments one
counter per row via independent hashes; a point estimate is the MIN of
its counters — always >= the true count, with overestimate bounded by
(e/width) * total_mass at confidence 1 - (1/2)^depth.

As a DataFrame the sketch IS a relation ``(row_idx, col_idx, cnt)``:

* build = one explode(depth) + one groupBy — a single shuffle whose
  cardinality is bounded by depth x width, NOT by key cardinality;
* merge = unionByName + sum (associative), same shape as
  operators/rollup.py partial state — incremental maintenance free;
* estimate = min over depth joined counters.

Hashes are xxhash64 with literal per-row salts — deterministic across
runs and partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_COLS = ("row_idx", "col_idx", "cnt")


def _col_idx(key: Column, row: int, width: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(f"cms-{row}")), F.lit(width)).cast(
        "int"
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch relation from one pass over the keys."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_idx"),
                _col_idx(F.col(key_col), r, width).alias("col_idx"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rc"))
        .groupBy(
            F.col("_rc.row_idx").alias("row_idx"),
            F.col("_rc.col_idx").alias("col_idx"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width)."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a set of keys: min over the depth counters.
    Missing counters mean the (row, col) was never touched -> 0."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        _col_idx(F.col(key_col), r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rc"),
    ).select(key_col, "_rc.row_idx", "_rc.col_idx")
    joined = probes.join(
        F.broadcast(sketch), on=["row_idx", "col_idx"], how="left"
    ).fillna({"cnt": 0})
    return joined.groupBy(key_col).agg(
        F.min("cnt").cast("long").alias("est_count")
    )
