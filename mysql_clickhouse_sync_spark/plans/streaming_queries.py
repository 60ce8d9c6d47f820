"""Driver-graded Structured Streaming CDC query.

Every other registry entry exercises the BATCH operators; this one
runs the actual streaming runtime (SURVEY.md §2.9, C1-C6):
``run_initial_sync_then_stream`` writes the version-0 snapshot, opens
``readStream`` over a JSON changelog, drains it with an
``availableNow`` trigger through the real ``foreachBatch`` apply path
(checkpointed microbatch appends into the parquet sink), and the
query returns the ``live_view`` over whatever the STREAM produced.

The oracle is the same batch CTE block the ``cdc_live_orders``
flagship uses — so a driver hash-green row here proves end-to-end
that the streaming pipeline (snapshot handoff, microbatch apply,
at-least-once replay absorption, merge-on-read) computes exactly the
batch answer.  That equality is the pipeline's design contract
("ALL semantics live in the batch operators", streaming/cdc_pipeline
module docstring) — this entry makes the driver verify it, not just
the unit suite.

Parity: the full reference CDC loop
(``/root/reference/src/cdc_replicator.py:99-212`` stream-read ->
decode -> apply; ``:238-261`` initial sync + overlap handoff;
``:347-356`` position checkpointing), executed through Spark
Structured Streaming instead of a hand-rolled binlog loop.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..sources.changelog import (
    ORDERS_PK,
    _USER_COLS as _USER_COL_TUPLE,
    derive_orders_changelog,
)
from ..sources.parquet import load_table
from ..streaming.cdc_pipeline import (
    CDCStreamPipeline,
    run_initial_sync_then_stream,
)
from .cdc_queries import _ORACLE_CDC_CTES, _USER_COLS
from .registry import register

# Schema the stream decodes changelog JSON with — the analogue of the
# reference's cached table schema for binlog decode
# (/root/reference/src/cdc_replicator.py:150-155).
_CHANGELOG_SCHEMA = StructType(
    [
        StructField("op", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        # orders.parquet reads as TIMESTAMP_NTZ (naive, like the
        # reference MySQL DATETIME); the JSON round-trip must decode to
        # the same type or the sink's mergeSchema read fails.
        StructField("o_orderdate", TimestampNTZType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)


@register(
    "cdc_streaming_live",
    oracle=_ORACLE_CDC_CTES
    + f"SELECT {_USER_COLS} FROM ranked WHERE __rn = 1 AND _deleted = 0",
    description="END-TO-END STREAMING: snapshot handoff + "
    "availableNow drain of the JSON changelog through the real "
    "Structured Streaming pipeline (checkpointed foreachBatch "
    "appends), then live_view over the sink the STREAM wrote.  "
    "Oracle = the batch cdc_live_orders SQL, so the driver "
    "hash-verifies that streaming and batch apply agree exactly "
    "(C1-C6; the microbatch split is immaterial by construction — "
    "dedup-latest resolves versions at read)",
)
def cdc_streaming_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    # One working dir per (session, sf_dir), REUSED across calls: a
    # fresh mkdtemp per invocation would leak a full orders copy +
    # changelog + checkpoint every time the driver / fidelity gate /
    # bench calls this fn.  Keyed by applicationId so concurrent
    # sessions (pytest vs driver) never share a dir; every stage below
    # overwrites (changelog overwrite, snapshot overwrite, checkpoint
    # rmtree inside run_initial_sync_then_stream), so reuse is safe
    # within a session, and growth is bounded at one dir per session.
    base = os.path.join(
        tempfile.gettempdir(),
        f"cdc_streaming_live_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    os.makedirs(base, exist_ok=True)
    # 8 files against maxFilesPerTrigger=4 forces MULTIPLE microbatches
    # so the checkpointed multi-batch path is what gets graded, not a
    # degenerate single-batch drain.
    changelog_dir = os.path.join(base, "changelog")
    (
        derive_orders_changelog(orders)
        .repartition(8)
        .write.mode("overwrite")
        .json(changelog_dir)
    )

    pipe = CDCStreamPipeline(
        spark, "orders", list(ORDERS_PK), _CHANGELOG_SCHEMA, base
    )
    # The sink must not accumulate appends across reuse of the dir:
    # the initial-sync snapshot write is mode("overwrite"), which
    # clears the previous run's target before the stream re-drains.
    run_initial_sync_then_stream(
        # unstamped user columns: run_initial_sync_then_stream stamps
        # _version/_deleted/_seq itself (same contract as main.py)
        pipe, orders.select(*_USER_COL_TUPLE), changelog_dir
    )
    # localCheckpoint: live() is a LAZY parquet read over this
    # session-reused dir — the next invocation overwrites the sink, so
    # a DataFrame held from an earlier call would hit missing files or
    # silently read replaced data.  Same pinning rule as
    # events_streaming_hourly below.
    return pipe.live().localCheckpoint()


@register(
    "cdc_initial_sync_crash_recovery",
    oracle=_ORACLE_CDC_CTES
    + f"SELECT {_USER_COLS}, TRUE AS resync_exact "
    "FROM ranked WHERE __rn = 1 AND _deleted = 0",
    description="INITIAL-SYNC CRASH RECOVERY — the last crash-shaped "
    "gap closed (r11 verdict item 2: CDC stream restart and ingest "
    "fan-out crash were graded; the snapshot COPY itself was not): "
    "the cold start runs run_initial_sync_then_stream with a "
    "3-chunk PK-bucketed snapshot copy (the Spark shape of the "
    "reference's batched INSERT loop, "
    "/root/reference/src/cdc_replicator.py:238-261, whose crash "
    "behavior the reference never tests) and is KILLED TWICE: "
    "attempt 1 dies after chunk 1 of 3 commits — partial snapshot "
    "parquet on disk, position captured (checkpoint cleared) but "
    "never saved — and attempt 2 dies after ALL chunks commit but "
    "BEFORE the stream starts (complete copy, still no saved "
    "position).  Each restart re-enters the SAME production "
    "function — the reference's delete-position-file full resync "
    "(cdc_replicator.py:65-79): chunk 0's overwrite clears the "
    "crashed attempt's partial files and the checkpoint rmtree "
    "forces the changelog to replay from offset zero, so attempt 3 "
    "converges structurally.  The graded output is the recovered "
    "live view hash-matched against the NO-CRASH batch oracle "
    "(cdc_streaming_live's contract); resync_exact folds in the "
    "injection honesty: both crash points fired, exactly 2 failed "
    "attempts, the mid-copy state was GENUINELY partial (0 < rows < "
    "|snapshot| on disk) with no checkpoint dir, and the pre-stream "
    "state was complete (rows == |snapshot|) still without a "
    "checkpoint.  A resync that skipped changelog files, kept "
    "crashed-attempt rows, or double-applied the overlap window "
    "hash-mismatches.  Untimed drain row (correctness surface), "
    "disclosed in tests/test_bench_contract.py",
)
def cdc_initial_sync_crash_recovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        f"cdc_sync_crash_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    os.makedirs(base, exist_ok=True)
    changelog_dir = os.path.join(base, "changelog")
    (
        derive_orders_changelog(orders)
        .repartition(8)
        .write.mode("overwrite")
        .json(changelog_dir)
    )
    pipe = CDCStreamPipeline(
        spark, "orders", list(ORDERS_PK), _CHANGELOG_SCHEMA, base
    )
    snap = orders.select(*_USER_COL_TUPLE)
    n_full = snap.count()

    # two one-shot crash points: "mid_copy" fires after chunk 1 of 3
    # commits (partial snapshot on disk, no saved position) and
    # "pre_stream" fires after the LAST chunk commits but before the
    # stream opens (complete copy, position still unsaved — the
    # capture-before-copy overlap with nothing persisted).
    crash = {"pending": ["mid_copy", "pre_stream"]}

    def on_chunk(i: int, total: int) -> None:
        if crash["pending"]:
            head = crash["pending"][0]
            if head == "mid_copy" and i == 0:
                crash["pending"].pop(0)
                raise RuntimeError(
                    "injected mid-copy crash (initial sync row)"
                )
            if head == "pre_stream" and i == total - 1:
                crash["pending"].pop(0)
                raise RuntimeError(
                    "injected copy-complete/position-unsaved crash "
                    "(initial sync row)"
                )

    attempts = 0
    state_ok = True
    while True:
        try:
            run_initial_sync_then_stream(
                pipe, snap, changelog_dir,
                copy_chunks=3, on_chunk_copied=on_chunk,
            )
            break
        except RuntimeError as exc:
            if "injected" not in str(exc):
                raise
            attempts += 1
            if attempts > 2:
                raise
            # verify the crash left EXACTLY the state the row claims
            # to grade, before the production path restarts: data
            # rows on disk per the fired point, and NO checkpoint
            # (the stream never opened, so no position was saved —
            # a restart that trusted a stale one would skip files)
            n_disk = pipe.table_df().count()
            expected_partial = attempts == 1 and 0 < n_disk < n_full
            expected_complete = attempts == 2 and n_disk == n_full
            state_ok = state_ok and (
                (expected_partial or expected_complete)
                and not os.path.isdir(pipe.checkpoint_dir)
            )
    resync_exact = (
        attempts == 2 and not crash["pending"] and state_ok
    )
    if not resync_exact:
        raise RuntimeError(
            "initial-sync crash injection dishonest: "
            f"attempts={attempts} unfired={crash['pending']} "
            f"state_ok={state_ok} — the recovery path would grade "
            "green without having run"
        )
    return (
        pipe.live()
        .withColumn("resync_exact", F.lit(True))
        .localCheckpoint()
    )


@register(
    "cdc_streaming_upsert",
    oracle=_ORACLE_CDC_CTES
    + """
    SELECT o_orderkey AS id,
           CAST(_version AS BIGINT) AS version,
           o_orderpriority AS payload
    FROM ranked WHERE __rn = 1 AND _deleted = 0
    """,
    description="PUSH-BASED STREAMING UPSERT VIEW graded end-to-end "
    "(streaming_upsert_view / applyInPandasWithState — the last "
    "streaming operator that carried only unit-suite evidence): the "
    "applied orders changelog streams through per-key state in 4+ "
    "microbatches (maxFilesPerTrigger), each key's state holding one "
    "(version, seq, deleted, payload) tuple and emitting ONLY when "
    "the key's live state advances — duplicate deliveries (the "
    "twice-delivered v1 update) and stale replays absorb silently at "
    "the state store.  Emissions append to a parquet sink via "
    "foreachBatch; because per-key emissions are monotone in "
    "(version, seq), the max_by over the sink is the final live "
    "state regardless of how the drain batched, and the oracle is "
    "the same ranked-CTE live view the batch path uses — so the "
    "driver hash-verifies that push-based state upserts == "
    "merge-on-read dedup_latest",
)
def cdc_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import streaming_upsert_view
    from .cdc_queries import _applied_orders

    rows = _applied_orders(spark, sf_dir).select(
        F.col("o_orderkey").alias("id"),
        F.col("_version").cast("long"),
        # the snapshot wave carries NULL _seq in the batch model; the
        # state tuple compares ints, and version 0 is snapshot-only,
        # so coalescing to 0 cannot reorder anything
        F.coalesce(F.col("_seq"), F.lit(0)).cast("long").alias("_seq"),
        F.col("_deleted").cast("int"),
        F.col("o_orderpriority").alias("payload"),
    )
    src, ckpt, sink = _two_drain_dirs(
        spark, "cdc_streaming_upsert", sf_dir
    )
    # 8 files vs maxFilesPerTrigger=2 forces 4+ microbatches, so keys
    # updated across waves genuinely exercise cross-batch state.
    rows.repartition(8).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    # The state store creates shuffle.partitions stores PER BATCH (the
    # width is frozen into the checkpoint at first start — the real
    # production sizing knob for stateful queries).  A vanilla
    # 200-partition session pays 200 Python state tasks x 4 batches
    # for 15k keys (~100 s of pure task overhead, measured); size the
    # stateful width to the harness and restore the session conf after
    # the drain — batch reads below are unaffected.
    # CONCURRENCY CONTRACT: the override is session-global for the
    # duration of the drain (OSS Spark has no per-stream knob for the
    # stateful width — it is read from the session conf at first
    # start), so a query running CONCURRENTLY on this session during
    # the drain would inherit 8 shuffle partitions.  Registry queries
    # run sequentially in the driver/gate/bench harnesses (the
    # registry's execution model), which is what makes the
    # set-try-finally-restore pattern safe here; a multi-tenant
    # deployment should run stateful streams in their own session
    # (SparkSession.newSession() carries an independent conf).
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (
            streaming_upsert_view(stream)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda batch, _id: batch.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)

    emitted = spark.read.parquet(sink)
    latest = F.max_by(
        F.struct("_version", "_seq", "_deleted", "payload"),
        F.struct("_version", "_seq"),
    )
    return (
        emitted.groupBy("id")
        .agg(latest.alias("_b"))
        .filter(F.col("_b._deleted") == 0)
        .select(
            "id",
            F.col("_b._version").alias("version"),
            F.col("_b.payload").alias("payload"),
        )
        .localCheckpoint()
    )


def _utc_instant(ts_col: str = "ts"):
    """Naive NTZ fields -> a TIMESTAMP instant interpreted as UTC.

    withWatermark requires TIMESTAMP (an instant), and NTZ->TIMESTAMP
    casts go through the session timezone (half-hour zones would shift
    every bucket vs the tz-free oracles).  make_timestamp with an
    EXPLICIT 'UTC' argument maps the naive fields to an instant
    independently of the session zone; emit outputs as epoch seconds
    (``unix_timestamp`` of an instant is tz-free) and nothing in the
    pipeline consults spark.sql.session.timeZone.  Shared by every
    two-drain streaming query below — the DECIMAL(16,6) seconds cast
    keeps microsecond fractions."""
    return F.expr(
        f"make_timestamp(year({ts_col}), month({ts_col}), "
        f"day({ts_col}), hour({ts_col}), minute({ts_col}), "
        f"CAST(date_part('SECOND', {ts_col}) AS DECIMAL(16,6)), 'UTC')"
    )


def _two_drain_dirs(
    spark: SparkSession, prefix: str, sf_dir: str
) -> tuple[str, str, str]:
    """(src, ckpt, sink) for a checkpointed two-drain streaming query,
    keyed per (session, sf_dir) like the other streaming rows.  Fresh
    checkpoint AND sink every call: the checkpoint carries the
    watermark + seen-files log BETWEEN the two drains (that is the
    point), but reusing it across invocations would re-read nothing
    and double up the append-mode sink."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    src, ckpt, sink = (
        os.path.join(base, d) for d in ("src", "ckpt", "sink")
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    return src, ckpt, sink


def _drain_append(spark: SparkSession, src, ckpt, sink, transform) -> None:
    """One availableNow drain: parquet stream over ``src`` ->
    ``transform(stream)`` -> append-mode parquet ``sink``.

    No maxFilesPerTrigger: each drain folds its files into ONE data
    microbatch, so late-row filtering runs against exactly the
    checkpointed watermark (deterministic regardless of file listing
    order); the trailing no-data batch then advances the watermark
    and emits newly-closed state."""
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "events_streaming_append",
    oracle="""
    WITH a AS (SELECT ts, value FROM events WHERE event_id % 4 <> 0),
    b AS (SELECT ts, value FROM events WHERE event_id % 4 = 0),
    w1 AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM a),
    w2 AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events),
    kept AS (
        SELECT ts, value FROM a
        UNION ALL
        SELECT b.ts, b.value FROM b, w1
        WHERE date_trunc('hour', b.ts) + INTERVAL 1 HOUR > w1.wm
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS ws,
               count(*) AS n,
               SUM(CAST(value AS DECIMAL(12,4))) AS tv
        FROM kept GROUP BY 1
    )
    SELECT CAST(epoch(ws) AS BIGINT) AS window_start_s,
           CAST(n AS BIGINT) AS n_events,
           CAST(tv AS DOUBLE) AS total_value
    FROM agg, w2
    WHERE ws + INTERVAL 1 HOUR <= w2.wm
    """,
    description="END-TO-END APPEND-MODE WATERMARKED STREAMING (the "
    "production output mode — round-5 verdict item 5; the hourly row "
    "above grades complete-mode state merge): two availableNow drains "
    "against one checkpoint.  Drain 1 aggregates the on-time 3/4 of "
    "events (event_id % 4 <> 0) and leaves watermark W1 = max(a.ts) - "
    "1h in the checkpoint; the remaining 1/4 is then appended as a "
    "late file, and drain 2 DROPS its rows whose hour-window closed "
    "before W1 (their state was already evicted and emitted), folds "
    "the survivors into still-open windows, and finally emits every "
    "window whose end <= W2 = max(ts) - 1h.  The parquet file sink "
    "accumulates across both drains.  The batch oracle mirrors the "
    "exact drop rule (window end > W1 survives) and emission rule "
    "(window end <= W2), so the driver hash-verifies watermark "
    "eviction, late-row drop and append finalization — not just state "
    "merge (reference analogue: last-writer-wins late policy, "
    "/root/reference/README.md:478-497, upgraded to event-time "
    "semantics)",
)
def events_streaming_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    src, ckpt, sink = _two_drain_dirs(
        spark, "events_streaming_append", sf_dir
    )
    ev_i = ev.select("event_id", _utc_instant().alias("tsi"), "value")
    on_time = ev_i.filter(F.col("event_id") % 4 != 0).drop("event_id")
    late = ev_i.filter(F.col("event_id") % 4 == 0).drop("event_id")
    # overwrite clears the previous invocation's late files too
    on_time.repartition(4).write.mode("overwrite").parquet(src)

    def windowed(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("tsi", "1 hour")
            .groupBy(F.window("tsi", "1 hour").alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,4)")).alias("_tv"),
            )
            .select(
                F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
                F.col("n_events").cast("long").alias("n_events"),
                F.col("_tv").cast("double").alias("total_value"),
            )
        )

    _drain_append(spark, src, ckpt, sink, windowed)
    late.repartition(2).write.mode("append").parquet(src)
    _drain_append(spark, src, ckpt, sink, windowed)
    # localCheckpoint: same pinning rule as the other streaming rows —
    # the sink dir is cleared by the next invocation.
    return spark.read.parquet(sink).localCheckpoint()


@register(
    "events_streaming_dedup",
    oracle="""
    SELECT event_id, value FROM events
    """,
    description="END-TO-END STREAMING DEDUPLICATION "
    "(dropDuplicatesWithinWatermark — the at-least-once absorber for "
    "streams with no _version column): the full events table is "
    "drained once (every row emitted, state keyed by event_id), then "
    "the ENTIRE table is re-delivered as a second drain against the "
    "same checkpoint — a total re-delivery, the worst at-least-once "
    "case.  Re-delivered rows either match live state (duplicate -> "
    "dropped) or arrive below the checkpointed watermark (late -> "
    "dropped, their state already freed), so the sink holds each "
    "event EXACTLY once; the oracle is simply every event, once.  "
    "Cross-batch state, watermark expiry and late-drop all exercised "
    "on the real runtime (same two-drain determinism pattern as "
    "events_streaming_append)",
)
def events_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import dedup_within_watermark

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    src, ckpt, sink = _two_drain_dirs(
        spark, "events_streaming_dedup", sf_dir
    )
    ev_i = ev.select("event_id", _utc_instant().alias("tsi"), "value")
    ev_i.repartition(4).write.mode("overwrite").parquet(src)

    def deduped(stream: DataFrame) -> DataFrame:
        return dedup_within_watermark(
            stream, ["event_id"], ts_col="tsi", watermark="1 hour"
        ).select("event_id", "value")

    _drain_append(spark, src, ckpt, sink, deduped)
    ev_i.repartition(4).write.mode("append").parquet(src)   # re-delivery
    _drain_append(spark, src, ckpt, sink, deduped)
    return spark.read.parquet(sink).localCheckpoint()


def _interval_join_boundary_us(
    clicks: DataFrame, purchases: DataFrame
) -> int:
    """Deterministic drain boundary (epoch microseconds) for the
    graded interval-join row, chosen FROM an actual matched pair so
    the two-drain split genuinely severs >= 1 match across the
    checkpoint: the pair with the MAXIMUM positive lag (ties: later
    click, then later purchase — a unique max because event times are
    microsecond-distinct), boundary = the pair's temporal midpoint,
    so click < boundary <= purchase by construction.  A naive
    timeline midpoint straddles ZERO pairs at every harness scale
    (measured — pairs cluster in bursts), which would make the
    two-drain structure vacuous.  Falls back to the timeline midpoint
    when no positive-lag pair exists.  Harness scaffolding: the
    boundary selection is one tiny batch join, not part of the
    streaming operator under test."""
    c = clicks.select(F.unix_micros("tsi").alias("cus"), "user_id")
    p = purchases.select(F.unix_micros("tsi").alias("pus"), "user_id")
    cand = c.join(p, "user_id").filter(
        (F.col("pus") > F.col("cus"))
        & (F.col("pus") <= F.col("cus") + 30 * 60 * 1_000_000)
    )
    row = cand.agg(
        F.max(
            F.struct(
                (F.col("pus") - F.col("cus")).alias("lag"), "cus", "pus"
            )
        ).alias("b")
    ).first()["b"]
    if row is not None:
        # lag >= 1us => cus < mid <= pus
        return row["cus"] + (row["lag"] + 1) // 2
    bounds = clicks.select(F.unix_micros("tsi").alias("us")).unionByName(
        purchases.select(F.unix_micros("tsi").alias("us"))
    ).agg(F.min("us").alias("lo"), F.max("us").alias("hi")).first()
    return (bounds["lo"] + bounds["hi"]) // 2


def _drain_join_append(
    spark: SparkSession, src_l: str, src_r: str, ckpt: str, sink: str,
    transform,
) -> None:
    """One availableNow drain of TWO parquet file streams ->
    ``transform(left, right)`` -> append-mode parquet sink.  Same
    determinism contract as :func:`_drain_append`: each drain folds
    the currently-available files of each side into one data
    microbatch against the checkpointed state/watermark."""
    left = (
        spark.readStream.schema(spark.read.parquet(src_l).schema)
        .parquet(src_l)
    )
    right = (
        spark.readStream.schema(spark.read.parquet(src_r).schema)
        .parquet(src_r)
    )
    q = (
        transform(left, right)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "events_streaming_interval_join",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id,
           l.user_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS lag_us,
           r.value AS purchase_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
    description="END-TO-END STREAM-STREAM INTERVAL JOIN (the last "
    "§2.9-beyond-reference streaming operator without a driver row): "
    "even-id events play a click stream, odd-id events a purchase "
    "stream; each click matches purchases by the same user within "
    "[click, click + 30 min] through the watermarked interval_join "
    "operator — both sides buffered in the state store, state expiry "
    "bounded by watermark + delay.  TWO availableNow drains against "
    "one checkpoint split the timeline at the temporal midpoint of "
    "the maximum-lag pair (a naive timeline midpoint straddles zero "
    "pairs at every harness scale — measured), so >= 1 match has its "
    "click in drain 1 and purchase in drain 2 and MUST come from "
    "checkpointed join state recovered across query restarts "
    "(cross-drain match count pinned > 0 in "
    "tests/test_streaming_windows.py).  No row in drain 2 predates "
    "the drain-1 watermark (the split is by event time, watermark "
    "trails 1 h behind max), so nothing is late-dropped and the "
    "batch range-join oracle mirrors the full pair set exactly — a "
    "hash contract over microsecond-exact lag",
)
def events_streaming_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src_l, src_r, ckpt, sink, _joined, _max_us = _interval_join_two_drains(
        spark, sf_dir, "events_streaming_interval_join", how="inner"
    )
    return spark.read.parquet(sink).localCheckpoint()


def _interval_join_two_drains(
    spark: SparkSession, sf_dir: str, name: str, how: str
):
    """Shared core of the two graded interval-join rows (inner +
    left_outer): clicks/purchases split at the severed-match boundary,
    two availableNow drains against one checkpoint — ONE copy of the
    split, the projection, and the 30-minute window, so the twin rows'
    oracle contracts cannot drift.  Returns ``(src_l, src_r, ckpt,
    sink, joined, max_us)`` so the outer row can append its sentinel
    stage against the same checkpoint (``max_us`` is ``None`` for the
    inner row — only the outer sentinel needs it, and the aggregation
    is a full extra scan of events)."""
    from ..streaming.windows import interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    ev_i = ev.select(
        "event_id", "user_id", _utc_instant().alias("tsi"), "value"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"{name}_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    src_l, src_r, ckpt, sink = (
        os.path.join(base, d) for d in ("src_l", "src_r", "ckpt", "sink")
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)

    clicks = ev_i.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "tsi"
    )
    purchases = ev_i.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "tsi", "value"
    )
    mid_us = _interval_join_boundary_us(clicks, purchases)
    # max_us feeds only the OUTER rows' eviction sentinel; the inner
    # row discards it — computing it unconditionally would pay one
    # full extra scan of events per inner-row build
    max_us = (
        ev_i.agg(F.max(F.unix_micros("tsi"))).first()[0]
        if how in ("left_outer", "full_outer")
        else None
    )
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    clicks.filter(us("tsi") < mid_us).repartition(2).write.mode(
        "overwrite"
    ).parquet(src_l)
    purchases.filter(us("tsi") < mid_us).repartition(2).write.mode(
        "overwrite"
    ).parquet(src_r)

    def joined(left: DataFrame, right: DataFrame) -> DataFrame:
        j = interval_join(
            left, right, key="user_id", left_ts="tsi", right_ts="tsi",
            max_delay="30 minutes", watermark="1 hour", how=how,
        )
        return j.select(
            F.col("event_id").alias("click_id"),
            F.col("r_event_id").alias("purchase_id"),
            "user_id",
            (F.unix_micros("r_tsi") - F.unix_micros("tsi")).alias(
                "lag_us"
            ),
            F.col("r_value").alias("purchase_value"),
        )

    _drain_join_append(spark, src_l, src_r, ckpt, sink, joined)
    clicks.filter(us("tsi") >= mid_us).repartition(2).write.mode(
        "append"
    ).parquet(src_l)
    purchases.filter(us("tsi") >= mid_us).repartition(2).write.mode(
        "append"
    ).parquet(src_r)
    _drain_join_append(spark, src_l, src_r, ckpt, sink, joined)
    return src_l, src_r, ckpt, sink, joined, max_us


@register(
    "events_streaming_interval_join_outer",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id,
           l.user_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS lag_us,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
    LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
    description="END-TO-END LEFT-OUTER STREAM-STREAM INTERVAL JOIN — "
    "the eviction-driven emission semantic the inner row cannot "
    "grade: an unmatched click emits (purchase columns NULL) only "
    "once the min-across-streams watermark has passed its join "
    "window, when 'no match' is FINAL rather than 'no match yet'.  "
    "Same two-drain data split as events_streaming_interval_join "
    "(>= 1 match recovered from checkpointed state across restarts; "
    "ONE shared implementation so the twin rows cannot drift), then "
    "ONE SENTINEL drain appends a far-future row to BOTH sources "
    "(the join watermark is the minimum over its inputs): the "
    "sentinel data batch advances the watermark past every data "
    "window and the availableNow trigger's trailing no-data batch "
    "evicts against it in the same drain, so every unmatched data "
    "click flushes deterministically and the batch LEFT range join "
    "is an exact oracle: matched pairs hash-equal the inner row's "
    "set, plus one NULL-purchase row per never-converted click.  "
    "Sentinels are filtered from the graded output; the sentinel "
    "clicks themselves stay buffered (their windows outlive every "
    "watermark), which is itself the correct semantics",
)
def events_streaming_interval_join_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src_l, src_r, ckpt, sink, joined, max_us = _interval_join_two_drains(
        spark, sf_dir, "events_streaming_interval_join_outer",
        how="left_outer",
    )

    _interval_join_sentinel_drain(
        spark, src_l, src_r, ckpt, sink, joined, max_us
    )
    return (
        spark.read.parquet(sink)
        .filter(F.col("click_id") >= 0)
        .localCheckpoint()
    )


def _interval_join_sentinel_drain(
    spark: SparkSession, src_l: str, src_r: str, ckpt: str, sink: str,
    joined, max_us: int,
) -> None:
    """ONE sentinel row on EACH source (negative ids, user -1): the
    join watermark is min over both inputs, so both must advance
    for eviction to see it.  One sentinel DRAIN suffices: its data
    batch advances the watermark past every data window, and the
    availableNow trigger's trailing no-data batch evicts against
    the advanced watermark in the same drain (the behavior
    _drain_append documents; default noDataMicroBatches).  Every
    column is wrapped NULLABLE (when(true, ...)): bare literals
    write REQUIRED parquet fields, and a source whose read schema
    flips nullability between drains fails the restarted query with
    STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE.  Shared by the
    left-outer and full-outer graded rows so the flush contract
    cannot drift between them."""
    n = lambda c: F.when(F.lit(True), c)  # noqa: E731
    ts = F.timestamp_micros(F.lit(max_us + 36_000_000_000))  # +10 h
    spark.range(1).select(
        n(F.lit(-2).cast("long")).alias("event_id"),
        n(F.lit(-1).cast("long")).alias("user_id"),
        n(ts).alias("tsi"),
    ).write.mode("append").parquet(src_l)
    spark.range(1).select(
        n(F.lit(-1).cast("long")).alias("event_id"),
        n(F.lit(-1).cast("long")).alias("user_id"),
        n(ts).alias("tsi"),
        n(F.lit(0.0)).alias("value"),
    ).write.mode("append").parquet(src_r)
    _drain_join_append(spark, src_l, src_r, ckpt, sink, joined)


@register(
    "events_streaming_interval_join_full",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id,
           COALESCE(l.user_id, r.user_id) AS user_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS lag_us,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
    FULL JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
    description="END-TO-END FULL-OUTER STREAM-STREAM INTERVAL JOIN — "
    "completes the join family (inner + left-outer are graded): "
    "BOTH-side NULL-match emission under the min-across-streams "
    "watermark — clicks that never converted (purchase columns NULL) "
    "AND purchases with no attributable click (click columns NULL; "
    "the key surfaces via the operator's coalesced key contract).  "
    "Same two-drain data split as events_streaming_interval_join "
    "(>= 1 match recovered from checkpointed state across restarts; "
    "ONE shared implementation so the triplet rows cannot drift), "
    "then the SHARED both-side sentinel drain advances the watermark "
    "past every data window and the availableNow trailing no-data "
    "batch evicts both sides' unmatched rows deterministically — the "
    "batch FULL range join is an exact hash oracle: matched pairs "
    "hash-equal the inner row's set, plus one NULL-purchase row per "
    "never-converted click, plus one NULL-click row per orphan "
    "purchase.  The two sentinels match EACH OTHER (same user, same "
    "instant), so they emit as one matched pair and are filtered; "
    "their windows outlive every watermark, which is itself the "
    "correct semantics",
)
def events_streaming_interval_join_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src_l, src_r, ckpt, sink, joined, max_us = _interval_join_two_drains(
        spark, sf_dir, "events_streaming_interval_join_full",
        how="full_outer",
    )
    _interval_join_sentinel_drain(
        spark, src_l, src_r, ckpt, sink, joined, max_us
    )
    return (
        spark.read.parquet(sink)
        .filter(
            (F.coalesce(F.col("click_id"), F.lit(0)) >= 0)
            & (F.coalesce(F.col("purchase_id"), F.lit(0)) >= 0)
        )
        .localCheckpoint()
    )


@register(
    "events_streaming_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    description="END-TO-END STREAMING AGGREGATION: the tumbling-hour "
    "window of events_hourly_windows computed by Structured Streaming "
    "— events re-sharded into 8 files, drained availableNow at "
    "maxFilesPerTrigger=2 (4+ microbatches), windowed state merged "
    "incrementally across batches in the state store, complete-mode "
    "final state returned.  Oracle = the identical batch SQL, so the "
    "driver hash-verifies that multi-microbatch stateful aggregation "
    "equals the one-shot batch answer (DECIMAL sums make the result "
    "arrival-order-insensitive).  Watermarked append-mode eviction/"
    "late-drop semantics are driver-graded end-to-end by "
    "events_streaming_append above and property-tested in "
    "tests/test_streaming_windows.py — this row grades the "
    "state-merge path",
)
def events_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    base = os.path.join(
        tempfile.gettempdir(),
        f"events_streaming_hourly_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    # Fresh checkpoint every call: the src files are rewritten below,
    # and a stale offset log would make the drain process zero batches
    # (leaving the memory table empty) or reference replaced files.
    shutil.rmtree(ckpt, ignore_errors=True)
    # 8 files vs maxFilesPerTrigger=2 forces >= 4 microbatches; the
    # round-robin repartition scatters event time across batches, so
    # the state store genuinely MERGES every window across batches
    # (an event-time-ordered drain would trivially append).
    ev.repartition(8).write.mode("overwrite").parquet(src)

    # F.window groups the NTZ event time DIRECTLY (no watermark is
    # involved in a complete-mode drain, and Spark 4 windows NTZ fine)
    # — an instant cast here would make the graded result depend on
    # whatever spark.sql.session.timeZone the DRIVER's session carries
    # (half-hour zones shift every bucket; DST gaps shift an hour),
    # while the oracle's date_trunc('hour', ts) is timezone-free.
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).alias("_tv"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_streaming_hourly_sink")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # localCheckpoint: the memory view is REPLACED by the next
    # invocation, so pin this call's result before returning the
    # (lazily-collected) DataFrame to the driver.
    return (
        spark.table("events_streaming_hourly_sink")
        .select(
            F.col("w.start").alias("window_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("_tv").cast("double").alias("total_value"),
        )
        .localCheckpoint()
    )


def _session_boundary_us(ev_i: DataFrame) -> int:
    """Deterministic drain boundary (epoch microseconds) for the
    graded session-window row: the midpoint of the MAXIMUM-gap
    consecutive same-user pair that still MERGES under the 30-minute
    session gap (strictly < gap — Spark merges session windows only
    on strict overlap), ties broken by later event time then user
    then event id.  Splitting the timeline here guarantees >= 1
    session has events in BOTH drains, so the graded result can only
    be right if session state recovered from the checkpoint and
    merged across the restart (a naive timeline midpoint can fall in
    dead air and sever nothing)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("tsi", "event_id")
    us = F.unix_micros(F.col("tsi"))
    gap = (us - F.lag(us).over(w)).alias("_gap")
    row = (
        ev_i.select("user_id", "event_id", us.alias("_us"), gap)
        .filter(
            F.col("_gap").isNotNull()
            & (F.col("_gap") >= 2)            # midpoint strictly between
            & (F.col("_gap") < 30 * 60 * 1_000_000)
        )
        .orderBy(
            F.col("_gap").desc(), F.col("_us").desc(),
            F.col("user_id").desc(), F.col("event_id").desc(),
        )
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError(
            "no mergeable same-user event pair found — cannot build a "
            "cross-drain severed session at this scale"
        )
    r = row[0]
    return (r["_us"] - r["_gap"] + r["_us"]) // 2


@register(
    "events_streaming_sessions",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         >= 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE)
               AS total_value
    FROM s GROUP BY user_id, sid
    """,
    description="END-TO-END STREAMING SESSION WINDOWS (dynamic-gap "
    "F.session_window — the one watermark shape that was not yet "
    "driver-graded on the real runtime): per-user 30-minute-gap "
    "sessions aggregated in append mode across TWO availableNow "
    "drains against one checkpoint.  The timeline splits at the "
    "midpoint of the maximum-gap still-merging same-user pair, so "
    ">= 1 session has events in both drains and MUST be assembled "
    "from checkpointed session state merged across query restarts "
    "(pinned > 0 in tests/test_streaming_windows.py); no drain-2 row "
    "predates the drain-1 watermark (split is by event time, "
    "watermark trails 1 h), so nothing is late-dropped.  Drain 2 "
    "carries a +10 h sentinel row (user -1) that advances the "
    "watermark past every real session's close, so the sink holds "
    "EXACTLY the full batch sessionization of the table (the "
    "sentinel's own open session stays in state, never emitted) — a "
    "full hash contract against the lag/running-sum batch "
    "sessionizer, session starts pinned to the microsecond.  NOTE "
    "the session-identity rule is Spark's strict-overlap merge (gap "
    "== exactly 30 min starts a NEW session), hence >= in the "
    "oracle where the batch events_sessionization row uses >",
)
def events_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src, ckpt, sink = _two_drain_dirs(
        spark, "events_streaming_sessions", sf_dir
    )
    ev_i = ev.select(
        "event_id", "user_id", _utc_instant().alias("tsi"), "value"
    )
    mid_us = _session_boundary_us(ev_i)
    max_us = ev_i.agg(F.max(F.unix_micros("tsi"))).first()[0]
    us = F.unix_micros(F.col("tsi"))
    ev_i.filter(us < mid_us).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    def sessions(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("tsi", "1 hour")
            .groupBy(
                "user_id",
                F.session_window("tsi", "30 minutes").alias("w"),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,4)")).alias("_tv"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("w.start")).alias("session_start_us"),
                F.col("n_events").cast("long").alias("n_events"),
                F.col("_tv").cast("double").alias("total_value"),
            )
        )

    _drain_append(spark, src, ckpt, sink, sessions)
    # Drain 2: the rest of the timeline + the watermark-advancing
    # sentinel.  NULLABLE-wrapped literals (when(true, ...)): bare
    # literals write REQUIRED parquet fields and the restarted query
    # dies with STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE.
    n = lambda c: F.when(F.lit(True), c)  # noqa: E731
    sentinel = spark.range(1).select(
        n(F.lit(-1).cast("long")).alias("event_id"),
        n(F.lit(-1).cast("long")).alias("user_id"),
        n(F.timestamp_micros(F.lit(max_us + 36_000_000_000))).alias(
            "tsi"
        ),
        n(F.lit(None).cast("double")).alias("value"),
    )
    ev_i.filter(us >= mid_us).unionByName(sentinel).repartition(
        4
    ).write.mode("append").parquet(src)
    _drain_append(spark, src, ckpt, sink, sessions)
    return spark.read.parquet(sink).localCheckpoint()


# Per-table payload schemas for the graded mux row — the analogue of
# the reference's per-table schema cache for binlog decode
# (/root/reference/src/cdc_replicator.py:150-155,286-294), one entry
# per replicated table.
_MUX_ORDERS_PAYLOAD = StructType(_CHANGELOG_SCHEMA.fields[2:])
_MUX_CUSTOMER_PAYLOAD = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)


def _derive_customer_changelog(customer: DataFrame) -> DataFrame:
    """Customer-side event scenario for the mux row (single-scan
    conditional-emit, same shape as derive_orders_changelog):
    U seq1 (acctbal x 1.5) for custkey % 5 in (0, 1); D seq2 for
    % 5 = 1 — the delete SHADOWS that key's older live version, the
    order-matters FINAL semantics; U seq3 (acctbal x 2.0) for
    % 10 = 0 — a second update the dedup-latest must prefer."""
    key = F.col("c_custkey")
    bal = F.col("c_acctbal")

    def ev(valid, op: str, seq: int, bal_expr):
        return F.when(
            valid,
            F.struct(
                F.lit(op).alias("op"),
                F.lit(seq).cast("long").alias("seq"),
                key.alias("c_custkey"),
                bal_expr.alias("c_acctbal"),
                F.col("c_mktsegment").alias("c_mktsegment"),
            ),
        )

    events = F.array_compact(
        F.array(
            ev(key % 5 < 2, "U", 1, bal * F.lit(1.5)),
            ev(key % 5 == 1, "D", 2, bal),
            ev(key % 10 == 0, "U", 3, bal * F.lit(2.0)),
        )
    )
    return customer.select(F.explode(events).alias("_e")).select("_e.*")


@register(
    "cdc_multi_table_mux",
    oracle="""
    SELECT 'orders' AS src_table, o_orderkey AS pk,
           o_totalprice * CAST(1.2 AS DOUBLE) AS num_val,
           o_orderpriority AS str_val
    FROM orders WHERE o_orderkey % 14 = 0
    UNION ALL
    SELECT 'orders', o_orderkey,
           o_totalprice * CAST(1.1 AS DOUBLE), o_orderpriority
    FROM orders WHERE o_orderkey % 14 = 7
    UNION ALL
    SELECT 'orders', o_orderkey, o_totalprice, '5-REINSERTED'
    FROM orders WHERE o_orderkey % 14 = 1
    UNION ALL
    SELECT 'customer', c_custkey,
           c_acctbal * CAST(2.0 AS DOUBLE), c_mktsegment
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT 'customer', c_custkey,
           c_acctbal * CAST(1.5 AS DOUBLE), c_mktsegment
    FROM customer WHERE c_custkey % 10 = 5
    """,
    description="END-TO-END MULTI-TABLE MUX STREAM (C7 dispatch loop "
    "on the real runtime — upgraded from unit evidence): ONE "
    "multiplexed (table, op, seq, payload-JSON) changelog carrying "
    "the orders event scenario (incl. the duplicate-delivered v1 "
    "update), a customer scenario (update -> delete shadowing -> "
    "second update), and a NON-replicated table's event that the P5 "
    "membership filter must skip silently, drained through "
    "MultiTableCDCStream in >= 2 checkpointed microbatches "
    "(maxFilesPerTrigger=4 vs 8 files): per table present in each "
    "microbatch, filter + from_json with that table's cached schema "
    "+ stamp + append to that table's directory.  The graded output "
    "is BOTH tables' live views (aligned to src_table/pk/num_val/"
    "str_val), each hash-matched against its single-table batch "
    "oracle — so driver-green means the dispatch loop preserves "
    "exactly the per-table apply semantics.  No initial snapshot by "
    "design: the mux grades the dispatch path; snapshot handoff is "
    "cdc_streaming_live's contract.  Reference analogue: "
    "/root/reference/src/cdc_replicator.py:325-345 (dispatch), "
    ":330-333 (membership skip), scale-out guidance README.md:473-476",
)
def cdc_multi_table_mux(spark: SparkSession, sf_dir: str) -> DataFrame:
    mux, changelog_dir = _mux_scenario(
        spark, sf_dir, "cdc_multi_table_mux"
    )
    mux.start(changelog_dir).awaitTermination()
    return _mux_live_union(mux).localCheckpoint()


def _mux_scenario(spark: SparkSession, sf_dir: str, name: str):
    """Shared harness of the mux graded rows (dispatch + restart
    recovery): the two-table + skip-table changelog written as 8 JSON
    files (vs maxFilesPerTrigger=4 -> >= 2 checkpointed microbatches,
    so the dispatch loop's per-batch probe and per-table appends run
    across batches, not one degenerate pass) and a fresh
    MultiTableCDCStream over a per-call scratch dir (the per-table
    sinks are append-mode parquet and the mux checkpoint tracks seen
    files — reuse would double apply).  ONE copy of the scenario so
    the twin rows' oracle contracts cannot drift."""
    from ..streaming.multi_table import MultiTableCDCStream

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = os.path.join(
        tempfile.gettempdir(),
        f"{name}_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(base, ignore_errors=True)
    changelog_dir = os.path.join(base, "changelog")

    o_mux = derive_orders_changelog(orders).select(
        F.lit("orders").alias("table"),
        "op",
        "seq",
        F.to_json(F.struct(*_USER_COL_TUPLE)).alias("payload"),
    )
    c_mux = _derive_customer_changelog(customer).select(
        F.lit("customer").alias("table"),
        "op",
        "seq",
        F.to_json(
            F.struct("c_custkey", "c_acctbal", "c_mktsegment")
        ).alias("payload"),
    )
    # one event for a table OUTSIDE the replicated set: the P5
    # membership filter must skip it without failing the stream
    n_mux = spark.range(1).select(
        F.lit("nation").alias("table"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
        F.lit('{"n_nationkey": 0}').alias("payload"),
    )
    o_mux.unionByName(c_mux).unionByName(n_mux).repartition(
        8
    ).write.mode("overwrite").json(changelog_dir)

    mux = MultiTableCDCStream(
        spark,
        schemas={
            "orders": _MUX_ORDERS_PAYLOAD,
            "customer": _MUX_CUSTOMER_PAYLOAD,
        },
        pks={"orders": ["o_orderkey"], "customer": ["c_custkey"]},
        base_dir=base,
    )
    return mux, changelog_dir


def _mux_live_union(mux) -> DataFrame:
    o_live = mux.live("orders").select(
        F.lit("orders").alias("src_table"),
        F.col("o_orderkey").alias("pk"),
        F.col("o_totalprice").alias("num_val"),
        F.col("o_orderpriority").alias("str_val"),
    )
    c_live = mux.live("customer").select(
        F.lit("customer").alias("src_table"),
        F.col("c_custkey").alias("pk"),
        F.col("c_acctbal").alias("num_val"),
        F.col("c_mktsegment").alias("str_val"),
    )
    # localCheckpoint upstream at the callers: the live views are lazy
    # reads over a session-reused dir, cleared by the next invocation
    return o_live.unionByName(c_live)


@register(
    "cdc_mux_restart_recovery",
    oracle="""
    SELECT 'orders' AS src_table, o_orderkey AS pk,
           o_totalprice * CAST(1.2 AS DOUBLE) AS num_val,
           o_orderpriority AS str_val, TRUE AS recovered
    FROM orders WHERE o_orderkey % 14 = 0
    UNION ALL
    SELECT 'orders', o_orderkey,
           o_totalprice * CAST(1.1 AS DOUBLE), o_orderpriority, TRUE
    FROM orders WHERE o_orderkey % 14 = 7
    UNION ALL
    SELECT 'orders', o_orderkey, o_totalprice, '5-REINSERTED', TRUE
    FROM orders WHERE o_orderkey % 14 = 1
    UNION ALL
    SELECT 'customer', c_custkey,
           c_acctbal * CAST(2.0 AS DOUBLE), c_mktsegment, TRUE
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT 'customer', c_custkey,
           c_acctbal * CAST(1.5 AS DOUBLE), c_mktsegment, TRUE
    FROM customer WHERE c_custkey % 10 = 5
    """,
    description="CRASH-RESTART RECOVERY ON THE MUX RUNTIME (C8 "
    "upgraded from unit evidence to a driver hash contract, composed "
    "with the C7 dispatch loop): the SAME two-table + skip-table "
    "changelog as cdc_multi_table_mux (one shared scenario builder), "
    "but the stream is KILLED mid-drain — the first microbatch with "
    "batch_id >= 1 applies its ORDERS slice, then raises before the "
    "customer apply (a PARTIAL per-table application, the hardest "
    "crash point: the batch is uncommitted but half its work is on "
    "disk).  run_stream_with_restart supervises (capped-backoff "
    "reopen-from-checkpoint, the Spark twin of the reference's "
    "reconnect-from-saved-position loop, /root/reference/src/"
    "cdc_replicator.py:369-414): the restarted query replays the "
    "uncommitted batch against the SAME checkpoint — the orders rows "
    "append a second time (at-least-once, absorbed by the live "
    "view's dedup-latest exactly like the reference's overlap "
    "replay) and the customer rows apply once.  recovered asserts "
    ">= 1 restart actually happened; the graded output is BOTH live "
    "views hash-matched against the same single-table batch oracles "
    "as the no-crash row — driver-green means kill/resume loses "
    "nothing and duplicates nothing",
)
def cdc_mux_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.cdc_pipeline import run_stream_with_restart

    mux, changelog_dir = _mux_scenario(
        spark, sf_dir, "cdc_mux_restart_recovery"
    )
    real_apply = mux.apply_microbatch
    crashed = {"done": False}

    def crash_once(batch_df, batch_id):
        if not crashed["done"] and batch_id >= 1:
            crashed["done"] = True
            # partial application: the batch's orders slice lands on
            # disk, then the batch dies uncommitted
            real_apply(
                batch_df.filter(F.col("table") == "orders"), batch_id
            )
            raise RuntimeError(
                "injected mid-batch crash (restart-recovery row)"
            )
        real_apply(batch_df, batch_id)

    mux.apply_microbatch = crash_once
    restarts = run_stream_with_restart(
        mux, changelog_dir, available_now=True, max_restarts=3,
        sleep=lambda _s: None,
    )
    return (
        _mux_live_union(mux)
        .withColumn("recovered", F.lit(bool(restarts >= 1)))
        .localCheckpoint()
    )


@register(
    "cdc_mux_schema_evolution",
    oracle="""
    SELECT c_custkey AS pk,
           CAST(c_nationkey AS BIGINT) AS nationkey,
           c_acctbal * CAST(2.0 AS DOUBLE) AS acctbal,
           c_mktsegment AS mktsegment,
           'n-' || CAST(c_custkey AS VARCHAR) AS c_note
    FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 5 <> 1
    UNION ALL
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT),
           c_acctbal * CAST(1.5 AS DOUBLE),
           c_mktsegment,
           CAST(NULL AS VARCHAR)
    FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 <> 1
    """,
    description="SCHEMA EVOLUTION ON THE LIVE RUNTIME — additive AND "
    "type-widening in one stream (C10 upgraded past the reference, "
    "driver-graded on the mux runtime): drain 1 applies v1 updates "
    "for EVERY customer under the original schema (c_nationkey INT); "
    "the table's decode schema is then evolved mid-stream "
    "(evolve_table_schema: c_nationkey int -> LONG + c_note string "
    "ADDED — no restart, the from_json decode reads the registry at "
    "microbatch time); drain 2 applies v2 updates carrying the new "
    "column (custkey % 3 = 0) plus tombstones (% 5 = 1) against the "
    "SAME checkpoint.  The live view reads with the CURRENT widened "
    "schema: pre-evolution parquet files carry the NARROWER int32 "
    "physical type (promoted losslessly by the widened read — "
    "parquet schema MERGE would reject the mix) and null-fill "
    "c_note; deletes shadow both generations.  The reference "
    "documents mid-stream DDL as an acknowledged inconsistency "
    "(/root/reference/README.md:585-588); this row hash-proves both "
    "evolution classes end-to-end",
)
def cdc_mux_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.multi_table import MultiTableCDCStream

    customer = load_table(spark, sf_dir, "customer")
    base = os.path.join(
        tempfile.gettempdir(),
        f"cdc_mux_evo_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(base, ignore_errors=True)
    changelog_dir = os.path.join(base, "changelog")

    from pyspark.sql.types import IntegerType

    v1_schema = StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_nationkey", IntegerType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_mktsegment", StringType(), True),
        ]
    )
    # evolution = WIDEN c_nationkey int -> long AND ADD c_note
    v2_schema = StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_nationkey", LongType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_mktsegment", StringType(), True),
            StructField("c_note", StringType(), True),
        ]
    )
    key = F.col("c_custkey")

    # drain 1: v1 updates for every key, original 4-column payload
    # (c_nationkey decodes as INT — the narrow pre-evolution type)
    wave1 = customer.select(
        F.lit("customer").alias("table"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").alias("c_nationkey"),
                (F.col("c_acctbal") * F.lit(1.5)).alias("c_acctbal"),
                F.col("c_mktsegment").alias("c_mktsegment"),
            )
        ).alias("payload"),
    )
    wave1.repartition(4).write.mode("overwrite").json(changelog_dir)
    mux = MultiTableCDCStream(
        spark,
        schemas={"customer": v1_schema},
        pks={"customer": ["c_custkey"]},
        base_dir=base,
    )
    mux.start(changelog_dir).awaitTermination()

    # WIDEN mid-stream: no restart machinery, the next microbatch's
    # from_json decode simply reads the evolved registry entry
    mux.evolve_table_schema("customer", v2_schema)

    # drain 2: v2 updates CARRYING the new column + tombstones,
    # appended to the same changelog dir against the same checkpoint
    wave2 = customer.filter(key % 3 == 0).select(
        F.lit("customer").alias("table"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").cast("long").alias("c_nationkey"),
                (F.col("c_acctbal") * F.lit(2.0)).alias("c_acctbal"),
                F.col("c_mktsegment").alias("c_mktsegment"),
                F.concat(F.lit("n-"), key.cast("string")).alias(
                    "c_note"
                ),
            )
        ).alias("payload"),
    )
    wave3 = customer.filter(key % 5 == 1).select(
        F.lit("customer").alias("table"),
        F.lit("D").alias("op"),
        F.lit(3).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").cast("long").alias("c_nationkey"),
                F.col("c_acctbal").alias("c_acctbal"),
                F.col("c_mktsegment").alias("c_mktsegment"),
                F.lit(None).cast("string").alias("c_note"),
            )
        ).alias("payload"),
    )
    wave2.unionByName(wave3).repartition(4).write.mode("append").json(
        changelog_dir
    )
    mux.start(changelog_dir).awaitTermination()

    return (
        mux.live("customer")
        .select(
            F.col("c_custkey").alias("pk"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
            "c_note",
        )
        .localCheckpoint()
    )


@register(
    "cdc_mux_schema_drop",
    oracle="""
    SELECT c_custkey AS pk,
           CAST(c_nationkey AS INT) AS nationkey,
           c_acctbal * CAST(2.0 AS DOUBLE) AS acctbal,
           's2-' || CAST(c_custkey AS VARCHAR) AS segment
    FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 5 <> 1
    UNION ALL
    SELECT c_custkey,
           CAST(c_nationkey AS INT),
           c_acctbal * CAST(1.5 AS DOUBLE),
           CAST(NULL AS VARCHAR)
    FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 <> 1
    """,
    description="COLUMN DROP + RENAME SCHEMA EVOLUTION ON THE LIVE "
    "MUX RUNTIME (r9 verdict item 6, completing the evolution story "
    "past additive/widening): drain 1 applies v1 updates for EVERY "
    "customer under a 5-column schema (incl. c_phone and "
    "c_mktsegment); mid-stream — no restart, same checkpoint — "
    "evolve_table_schema(allow_drops=True) DROPS c_phone outright "
    "and RENAMES c_mktsegment -> c_segment as drop+add (the "
    "changelog-safe rename semantics: history is never backfilled, "
    "so pre-rename rows read NULL under the new name); drain 2 "
    "applies v2 updates (custkey % 3 = 0) carrying the evolved "
    "4-column payload plus tombstones (% 5 = 1).  The live view "
    "reads BOTH generations under the EXPLICIT current schema: old "
    "files' c_phone/c_mktsegment bytes are simply not selected (a "
    "parquet scan ignores file columns absent from the requested "
    "schema — the projection-compatible drop; the append sink never "
    "unwrites), old files null-fill c_segment, v2 winners carry it, "
    "and deletes shadow both generations.  Dropping a PK column is "
    "refused (the dedup identity), pinned with the validator "
    "contract in tests/test_streaming.py.  The reference documents "
    "ALL mid-stream DDL as an acknowledged inconsistency "
    "(/root/reference/README.md:585-588)",
)
def cdc_mux_schema_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType

    from ..streaming.multi_table import MultiTableCDCStream

    customer = load_table(spark, sf_dir, "customer")
    base = os.path.join(
        tempfile.gettempdir(),
        f"cdc_mux_drop_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(base, ignore_errors=True)
    changelog_dir = os.path.join(base, "changelog")

    v1_schema = StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_nationkey", IntegerType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_mktsegment", StringType(), True),
            StructField("c_phone", StringType(), True),
        ]
    )
    # evolution = DROP c_phone + RENAME c_mktsegment -> c_segment
    # (expressed as drop + add: pre-rename rows read NULL)
    v2_schema = StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_nationkey", IntegerType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_segment", StringType(), True),
        ]
    )
    key = F.col("c_custkey")

    # drain 1: v1 updates for every key, full 5-column payload
    wave1 = customer.select(
        F.lit("customer").alias("table"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").alias("c_nationkey"),
                (F.col("c_acctbal") * F.lit(1.5)).alias("c_acctbal"),
                F.col("c_mktsegment").alias("c_mktsegment"),
                F.concat(F.lit("p-"), key.cast("string")).alias(
                    "c_phone"
                ),
            )
        ).alias("payload"),
    )
    wave1.repartition(4).write.mode("overwrite").json(changelog_dir)
    mux = MultiTableCDCStream(
        spark,
        schemas={"customer": v1_schema},
        pks={"customer": ["c_custkey"]},
        base_dir=base,
    )
    mux.start(changelog_dir).awaitTermination()

    # DROP + RENAME mid-stream: the next microbatch's from_json
    # decode reads the evolved registry entry; no restart machinery
    mux.evolve_table_schema("customer", v2_schema, allow_drops=True)

    # drain 2: v2 updates carrying the evolved payload + tombstones,
    # appended to the same changelog dir against the same checkpoint
    wave2 = customer.filter(key % 3 == 0).select(
        F.lit("customer").alias("table"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").alias("c_nationkey"),
                (F.col("c_acctbal") * F.lit(2.0)).alias("c_acctbal"),
                F.concat(F.lit("s2-"), key.cast("string")).alias(
                    "c_segment"
                ),
            )
        ).alias("payload"),
    )
    wave3 = customer.filter(key % 5 == 1).select(
        F.lit("customer").alias("table"),
        F.lit("D").alias("op"),
        F.lit(3).cast("long").alias("seq"),
        F.to_json(
            F.struct(
                key.alias("c_custkey"),
                F.col("c_nationkey").alias("c_nationkey"),
                F.col("c_acctbal").alias("c_acctbal"),
                F.lit(None).cast("string").alias("c_segment"),
            )
        ).alias("payload"),
    )
    wave2.unionByName(wave3).repartition(4).write.mode("append").json(
        changelog_dir
    )
    mux.start(changelog_dir).awaitTermination()

    return (
        mux.live("customer")
        .select(
            F.col("c_custkey").alias("pk"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_segment").alias("segment"),
        )
        .localCheckpoint()
    )


@register(
    "events_streaming_enriched",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           c.c_mktsegment AS segment,
           CAST(c.c_nationkey AS INT) AS nationkey,
           e.value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
    description="STREAM-STATIC ENRICHMENT JOIN — the one Structured "
    "Streaming join shape not yet driver-graded (stream-stream inner "
    "+ left-outer are): the events stream joins the STATIC customer "
    "dimension on user_id = c_custkey, the canonical per-microbatch "
    "enrichment a production pipeline runs (no join state, no "
    "watermark requirement — the static side is (re)resolved per "
    "microbatch and broadcast at harness dim sizes).  Two "
    "availableNow drains against one checkpoint split the events by "
    "event_id parity, so the join is exercised across checkpointed "
    "microbatches and the sink accumulates both halves; oracle = the "
    "plain batch equi-join.  At 100 TB the static side is the "
    "broadcast dim (or a bucketed table when it outgrows broadcast) "
    "— same plan family as the graded batch joins",
)
def events_streaming_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_mktsegment"),
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
    )
    src, ckpt, sink = _two_drain_dirs(
        spark, "events_streaming_enriched", sf_dir
    )
    ev_i = ev.select(
        "event_id", "user_id", _utc_instant().alias("tsi"), "value"
    )
    ev_i.filter(F.col("event_id") % 2 == 0).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    def enriched(stream: DataFrame) -> DataFrame:
        return (
            stream.join(
                F.broadcast(customer),
                stream["user_id"] == customer["c_custkey"],
            )
            .select(
                "event_id",
                "user_id",
                F.col("c_mktsegment").alias("segment"),
                F.col("c_nationkey").alias("nationkey"),
                "value",
            )
        )

    _drain_append(spark, src, ckpt, sink, enriched)
    ev_i.filter(F.col("event_id") % 2 == 1).repartition(4).write.mode(
        "append"
    ).parquet(src)
    _drain_append(spark, src, ckpt, sink, enriched)
    return spark.read.parquet(sink).localCheckpoint()
