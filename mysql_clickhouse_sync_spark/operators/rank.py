"""Distributed global ranking / equal-frequency bucketing.

A global ``row_number()``/``ntile()`` window with no PARTITION BY pulls
every row through ONE task (Spark plans a ``SinglePartition`` exchange)
— the classic scale-killer for "rank all customers" queries.  The
distributed equivalent is the pattern ``RDD.zipWithIndex`` has always
used, expressed here in the DataFrame API so it stays inside codegen:

1. ``repartitionByRange`` on the total order — a range shuffle that
   spreads the sort across all partitions (skew handled by the range
   partitioner's sampling);
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the id
   packs (partition, in-partition sequence) into one long, so sorted
   partitions yield partition-local ranks with NO window operator and
   no further exchange;
3. per-partition row counts — at most ``num_partitions`` rows —
   collected to the driver and turned into literal offsets.  This
   bounded collect is identical to the count job inside
   ``zipWithIndex`` and is independent of data size.

``ntile_from_rank`` then reproduces SQL ``NTILE(n)`` semantics exactly
(first ``N mod n`` buckets get the extra row), so results are
bit-identical to the single-partition window — checked against a real
``ntile`` in tests/test_rank.py — while the whole plan costs ONE range
shuffle per ranking and never funnels data through one task.

Reference parity note: the reference engine has no ranking at all
(SURVEY.md §2.6-2.7); this operator exists so the extension analytics
(RFM segmentation etc.) hold up at the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id layout: partition id in the upper 31
# bits, record number within the partition in the lower 33 bits.
_MID_BITS = 33
_MID_MASK = (1 << _MID_BITS) - 1


#: offset-lookup strategy switch: up to this many partitions the
#: cumulative offsets fold into an O(1)-indexed array literal
#: (64k longs = 512 KB plan constant); beyond it a broadcast join of
#: the (pid, offset) relation keeps the plan small.
_MAX_OFFSET_LITERALS = 65_536

#: target rows per range partition when sizing adaptively: ranks are
#: narrow rows, so 1M rows ≈ tens of MB per task — thousands of
#: partitions at billions of rows, ONE at harness scale (partition
#: count follows the data, AQE-style, instead of the static conf).
ROWS_PER_RANGE_PARTITION = 1_000_000


def partitions_for(
    n_rows: int, rows_per_partition: int = ROWS_PER_RANGE_PARTITION
) -> int:
    """Adaptive range-partition count: ceil(n / rows_per_partition),
    floored at 1; not capped above — at 100 TB the count grows with
    the data, which is the whole point."""
    return max(1, -(-int(n_rows) // rows_per_partition))


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
    known_total: int | None = None,
) -> tuple[DataFrame, int]:
    """Dense global ``row_number`` over a TOTAL order, no global exchange.

    ``order_cols`` must define a total order (include a unique
    tie-break column) or ranks of tied rows are partitioner-dependent.
    Returns ``(df + rank_col, total_row_count)`` — the count is free
    (it is the sum of the per-partition counts already collected).

    ``num_partitions`` should track data size (``partitions_for``) —
    callers that know the row count can right-size the shuffle so a
    small relation costs small jobs while a huge one fans out.

    ``known_total`` is the caller-supplied exact row count of ``df``
    (callers sizing ``num_partitions`` via ``partitions_for`` already
    paid that count job).  With ``num_partitions == 1`` it enables the
    ZERO-EXTRA-JOB fast path: a single range partition needs no offset
    table (the only offset is 0) and no materialization barrier (no
    second job reads the partitioning), so the checkpoint + the
    per-partition-counts collect — two driver barriers per ranking —
    vanish.  At scale ``partitions_for`` yields > 1 partition and the
    general path below runs unchanged; semantics are identical either
    way (pinned in tests/test_rank.py).

    PRECONDITION of the fast path (r14 ADVICE): because it drops the
    ``localCheckpoint`` barrier the general path keeps, ``order_cols``
    being a STRICT total order is load-bearing, not just recommended —
    if two rows tie, separate actions over the returned DataFrame may
    re-sort them differently and assign different ranks per action.
    Under a strict total order the sort is deterministic, so every
    action reproduces identical ranks without a pin.  Current callers
    all pass a unique tie-break column; a future caller that consumes
    the result from multiple actions WITHOUT one must either add the
    tie-break or ``localCheckpoint`` the result itself.

    The ranged+sorted input is ``localCheckpoint``-ed so the offsets
    job and the final query read the *same* materialized partitioning;
    on a real cluster with reliable checkpoint storage this would be
    ``checkpoint()``.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions == 1 and known_total is not None:
        ranged = (
            df.repartitionByRange(1, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("_mid", F.monotonically_increasing_id())
        )
        local_rank = F.col("_mid").bitwiseAND(F.lit(_MID_MASK)) + F.lit(1)
        return (
            ranged.withColumn(rank_col, local_rank.cast("long"))
            .drop("_mid"),
            int(known_total),
        )
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    pid = F.shiftrightunsigned("_mid", _MID_BITS)
    # Bounded: at most num_partitions rows come back to the driver.
    counts = {
        r["_pid"]: r["_n"]
        for r in ranged.groupBy(pid.alias("_pid"))
        .agg(F.count("*").alias("_n"))
        .collect()
    }
    # Dense cumulative offsets indexed by partition id (range
    # partitions are 0..num_partitions-1; empty ones just inherit the
    # running offset — no row references them).
    dense: list[int] = [0] * max(num_partitions, 1)
    acc = 0
    for p in range(len(dense)):
        dense[p] = acc
        acc += counts.get(p, 0)
    local_rank = F.col("_mid").bitwiseAND(F.lit(_MID_MASK)) + F.lit(1)
    if len(dense) <= _MAX_OFFSET_LITERALS:
        # element_at on a FOLDABLE array literal is O(1) positional
        # access; the previous create_map literal paid a linear
        # GetMapValue scan — O(num_partitions) comparisons per row,
        # a per-row hot loop at the thousands of partitions this
        # operator targets (round-3 advice).
        arr = F.array(*[F.lit(o).cast("long") for o in dense])
        off_expr = F.element_at(arr, (pid + F.lit(1)).cast("int"))
        return (
            ranged.withColumn(
                rank_col, (local_rank + off_expr).cast("long")
            ).drop("_mid"),
            acc,
        )
    # Extreme partition counts (beyond what belongs in a plan
    # literal): broadcast-join the tiny (pid, offset) relation.
    spark_ = ranged.sparkSession
    off_df = spark_.createDataFrame(
        list(enumerate(dense)), "_pid long, _off long"
    )
    joined = (
        ranged.withColumn("_pid", pid.cast("long"))
        .join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            rank_col,
            (local_rank + F.coalesce("_off", F.lit(0))).cast("long"),
        )
        .drop("_mid", "_pid", "_off")
    )
    return joined, acc


def ntile_from_rank(rank: Column, total: int, n: int) -> Column:
    """SQL ``NTILE(n)`` bucket id (1-based) from a 1-based global rank.

    Standard semantics: with ``total = q*n + r`` rows, the first ``r``
    buckets hold ``q + 1`` rows, the rest ``q`` — identical in Spark
    and DuckDB, so an ntile-based oracle stays valid for rank-based
    plans.
    """
    q, r = divmod(int(total), n)
    if q == 0:
        # fewer rows than buckets: bucket i gets row i
        return rank.cast("int")
    head = r * (q + 1)
    return (
        F.when(rank <= head, F.ceil(rank / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - F.lit(head)) / F.lit(q)))
        .cast("int")
    )


def with_equal_freq_bucket(
    df: DataFrame,
    order_cols: list[Column],
    bucket_col: str,
    n: int,
    num_partitions: int | None = None,
    known_total: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_cols)`` without the
    SinglePartition exchange: global rank (range-partitioned) + the
    closed-form bucket assignment.  ``known_total`` (the caller's
    exact row count, if already paid for) feeds the single-partition
    zero-extra-job fast path of :func:`with_global_rank`."""
    ranked, total = with_global_rank(
        df, order_cols, "_grank", num_partitions, known_total=known_total
    )
    return ranked.withColumn(
        bucket_col, ntile_from_rank(F.col("_grank"), total, n)
    ).drop("_grank")
