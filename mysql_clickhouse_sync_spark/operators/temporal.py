"""Temporal operators: as-of join.

Spark has no ASOF JOIN (kdb/Pandas/DuckDB do).  The naive encoding —
``l JOIN r ON key AND r.ts <= l.ts`` + argmax — explodes to the full
range-join pair count before pruning.  This implementation is the
single-shuffle formulation:

    union(left, right) -> window per key ordered by (ts, side) ->
    carry forward the last right-row payload struct

i.e. a sort-merge over the union where each left row picks up the most
recent right row at or before its timestamp.  The payload travels as
ONE struct so a right row is matched atomically (per-column carry
would mix columns from different right rows when payloads hold
nulls).  Cost: one hash shuffle on the key + an in-partition sort —
the same price as any windowed op, independent of how many right rows
precede each left row.

At 100 TB: the window partitions by the join key, so key cardinality
drives parallelism (salt upstream if one key dominates); no state is
held beyond the sort, and no broadcast is required on either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"   # 0 = right (sorts first at equal ts), 1 = left
_PAY = "__rpay"
_BUCKET = "__bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``start <= point < end``) via bucket
    chunking.

    The naive encoding is a cross/theta join filtered afterwards —
    |points| x |intervals| pairs before pruning, which Spark plans as
    BroadcastNestedLoopJoin and which dies at scale.  Chunking maps
    every interval to each fixed-width bucket it overlaps (explode of a
    ``sequence`` — narrow) and every point to exactly one bucket, so
    the work becomes an EQUI-join on (keys..., bucket) + a residual
    range filter; shuffle volume tracks actual overlap density, not
    the cross product.  Columns are numeric (cast timestamps with
    ``unix_micros`` upstream); pick ``bucket_width`` near the median
    interval length so intervals land in O(1) buckets each.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how}")
    keys = list(keys)
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                # end is exclusive: the end-boundary bucket only matters
                # when the interval extends into it
                F.floor(
                    (F.col(end_col) - F.lit(1)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    cond = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    joined = p.join(iv, on=[*keys, _BUCKET], how="inner").filter(cond).drop(
        _BUCKET
    )
    if how == "inner":
        return joined
    # left: re-attach unmatched points with null interval columns
    matched_keys = joined.select(*points.columns).distinct()
    unmatched = points.join(
        matched_keys, on=list(points.columns), how="left_anti"
    )
    for c in joined.columns:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(joined.dtypes)[c])
            )
    return joined.unionByName(unmatched.select(joined.columns))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of left join: each left row gains the payload of the nearest
    right row at-or-before (``direction="backward"``, like DuckDB
    ``ASOF JOIN``; inclusive at equality) or at-or-after
    (``direction="forward"``) its timestamp, per key group; left rows
    with no match keep nulls.

    ``tolerance`` (same units as the ts columns — pass integer ts, or
    cast timestamps to epoch first) additionally nulls out matches
    farther than the bound, the pandas ``merge_asof`` contract a
    feature-store join needs ("features no staler than 1 h").

    One shuffle total (union + window carry, never a range self-join);
    forward is the same plan over the reversed ordering, and the two
    directions are exact mirrors: ``forward(ts) == backward(-ts)``
    (property-tested).

    ``right_cols`` defaults to every non-key, non-ts right column;
    each is emitted as ``<col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = list(keys)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload = list(right_cols)

    # carry the right ts inside the payload so tolerance can compare it
    pay_struct = F.struct(
        *[F.col(c) for c in payload], F.col(right_ts).alias("__rts")
    )
    pay_type = right.select(pay_struct.alias(_PAY)).schema[_PAY].dataType

    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    r_tagged = right.select(
        *keys,
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__ts"),
        pay_struct.alias(_PAY),
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(left.dtypes)[c])
            )

    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    ts_order = (
        F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        _PAY, F.last(_PAY, ignorenulls=True).over(w)
    )
    if tolerance is not None:
        gap = F.abs(
            F.col("__ts").cast("long")
            - F.col(f"{_PAY}.__rts").cast("long")
        )
        carried = carried.withColumn(
            _PAY, F.when(gap <= tolerance, F.col(_PAY))
        )
    return carried.filter(F.col(_SIDE) == 1).select(
        *left.columns,
        *[F.col(f"{_PAY}.{c}").alias(f"{c}{suffix}") for c in payload],
    )
