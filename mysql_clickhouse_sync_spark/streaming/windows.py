"""Event-time streaming operators: watermarked windows and custom
Pandas-backed state.

The reference has no event-time windowing — its late/duplicate policy
is structural last-writer-wins (SURVEY.md §2.9, "watermarks: none").
These operators are the extension surface a streaming analytics user
expects on top of the CDC tables:

* ``watermarked_window_counts`` — tumbling/sliding event-time windows
  with a watermark bounding state: late rows inside the watermark
  still land in their window; rows older than the watermark are
  dropped and their window's state has already been freed.  In append
  mode a window only emits once the watermark passes its end —
  exactly-once window results under at-least-once input.
* ``stateful_user_totals`` — ``applyInPandasWithState``: arbitrary
  per-key state (running totals here) maintained across microbatches
  in the state store, Arrow-batched on the Python side.  The shape to
  copy for custom stateful operators (sessionizers, CDC enrichment
  caches) that windows can't express.

Scale notes: watermark state is O(open windows x groups); the state
store is RocksDB-backed on a real cluster.  ``applyInPandasWithState``
shuffles by key once; state lives with the partition, so key skew is
the thing to watch (salt upstream if one user dominates).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def watermarked_window_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed counts/sums with bounded state."""
    win = (
        F.window(ts_col, window) if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _totals_fn(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Running per-user totals across microbatches via
    ``applyInPandasWithState`` (update-mode output: one refreshed row
    per user per microbatch it appears in)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: each left row matched to right
    rows with the same ``key`` whose timestamp falls in
    ``[left_ts, left_ts + max_delay]`` (attribution joins: click ->
    purchase within the hour).

    Both sides carry a watermark and the join condition is
    range-bounded on event time, so Spark can expire buffered state:
    a left row is held at most ``watermark + max_delay``, a right row
    at most ``watermark`` — state stays O(in-flight window), never
    O(stream history).  Without the time bound the state store would
    have to buffer both streams forever (Spark rejects that join in
    append mode for exactly this reason).

    ``how='inner'`` emits matches as soon as both rows arrive.
    ``how='left_outer'`` additionally emits every UNMATCHED left row
    (right columns null) — but only once the watermark has passed the
    row's join window, when "no match" is final rather than
    "no match yet"; until the watermark moves, unmatched rows sit in
    state (the conversion-funnel shape: clicks that never converted).
    A drain whose last batch never advances the watermark past a
    click's window keeps that click buffered into the NEXT run —
    correct, and asserted in tests.
    ``how='full_outer'`` emits unmatched rows from BOTH sides under
    the same eviction rule (purchases with no attributable click AND
    clicks that never converted — the reconciliation shape); the key
    column is coalesced across sides so right-only rows still carry
    it.

    Right-side columns are prefixed with ``right_prefix`` to keep the
    output schema collision-free.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            "interval_join supports how='inner'|'left_outer'|"
            f"'full_outer', got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns]
    )
    rk, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"interval {max_delay}"))
    )
    j = lw.join(rw, cond, how)
    if how == "full_outer":
        # a right-only emission carries the key ONLY in the prefixed
        # column; coalesce keeps the single-un-prefixed-key contract
        j = j.withColumn(key, F.coalesce(F.col(key), F.col(rk)))
    return j.drop(rk)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    drops re-deliveries arriving within the watermark delay, then
    FREES the key's state — the at-least-once absorber for streams
    whose rows have no ``_version`` to dedup-latest on (raw event
    ingestion, webhook feeds).

    Contrast with the CDC path: ``dedup_latest`` (merge-on-read) keeps
    state in the TABLE and needs no streaming state at all; this
    operator keeps state in the STORE and emits exactly-once rows.
    Plain ``dropDuplicates`` on a stream would grow state forever —
    the watermark variant is the only shape that survives at scale.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def _make_upsert_fn(pk_col: str, payload_cols: list[str]):
    """Build the per-key state function for :func:`streaming_upsert_view`
    over an ARBITRARY payload column list (the column names are closed
    over; cloudpickle ships the closure to the Python workers)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cur = state.get if state.exists else None
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            # VECTORIZED batch reduction: the only row that can
            # advance state is the batch's lexicographic
            # (_version, _seq) maximum, so find it with two column
            # scans (boolean mask + idxmax) instead of a per-row
            # Python walk — on a hot key with thousands of updates
            # per microbatch the walk was the Python cost center
            # (microbenched in tests/test_streaming_windows.py).
            # Tie semantics preserved: idxmax returns the FIRST
            # occurrence of the max _seq among max-_version rows,
            # exactly the row the strictly-greater walk kept.
            top = pdf.index[pdf["_version"].eq(pdf["_version"].max())]
            win = pdf["_seq"].loc[top].idxmax()
            v = pdf.at[win, "_version"]
            s = pdf.at[win, "_seq"]
            d = pdf.at[win, "_deleted"]
            # A NULL payload must stay NULL: pandas hands None
            # (object column) or NaN (numeric) here, and leaking
            # NaN into state would smuggle it out to the sink —
            # diverging from the batch live view, which keeps SQL
            # NULL.  (A nullable integral payload column arrives
            # float64-widened from Arrow — pandas semantics; the
            # output schema coerces it back on emit.)
            # DOCUMENTED LIMIT: for FLOAT payload columns, SQL
            # NULL and a genuine NaN VALUE are indistinguishable
            # once Arrow hands pandas a float64 column (both are
            # NaN) — this operator canonicalizes both to NULL,
            # the overwhelmingly-common intent; a pipeline that
            # must preserve literal NaN payloads should encode
            # them explicitly (e.g. a string column) before the
            # state boundary.
            payload = tuple(
                None
                if p is None or (isinstance(p, float) and p != p)
                else p
                for p in (pdf.at[win, c] for c in payload_cols)
            )
            cand = (int(v), int(s), int(d), *payload)
            # last-writer-wins: (_version, _seq) lexicographic
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur, changed = cand, True
        if changed:
            state.update(cur)
            out = {
                pk_col: [key[0]],
                "_version": [cur[0]],
                "_seq": [cur[1]],
                "_deleted": [cur[2]],
            }
            for i, c in enumerate(payload_cols):
                out[c] = [cur[3 + i]]
            yield pd.DataFrame(out)

    return fn


def streaming_upsert_view(stream: DataFrame, pk_col: str = "id") -> DataFrame:
    """Streaming last-writer-wins cache: per primary key, keep the max
    ``(_version, _seq)`` seen so far in per-key state and emit a row
    ONLY when the key's live state actually advances — the push-based
    twin of ``dedup_latest`` (merge-on-read).  Late or replayed
    changelog rows whose version is not newer are absorbed silently,
    which is the reference's at-least-once tolerance
    (/root/reference/README.md:493-497) enforced at the state store
    instead of at read time.

    Input rows: ``pk_col`` (any atomic type), ``_version``/``_seq``
    (integral), ``_deleted`` (integral), plus ANY other columns — all
    carried as the payload.  The state/output schemas are DERIVED from
    the input schema (pk + stamps + payload columns keep their input
    types), so a string primary key or a multi-column payload works
    without touching this function; a missing stamp column fails at
    planning with the real cause.  Output: the input columns in
    (pk, _version, _seq, _deleted, payload...) order, only for keys
    whose latest state changed in the microbatch.

    State per key is ONE tuple (version, seq, deleted, payload...) —
    O(live keys), RocksDB-backed on a cluster; contrast with the
    stateless merge-on-read path which keeps nothing but pays a
    window at query time.  Both views agree by construction (tested).
    Implemented on ``applyInPandasWithState``; Spark 4's
    ``transformWithStateInPandas`` (ValueState + timers/TTL) is the
    drop-in upgrade where its protobuf runtime dependency is
    available.
    """
    from pyspark.sql.types import StructField, StructType

    fields = {f.name: f for f in stream.schema.fields}
    if pk_col not in fields:
        raise ValueError(
            f"streaming_upsert_view: pk column {pk_col!r} not in input "
            f"schema {stream.schema.simpleString()}"
        )
    for req in ("_version", "_seq", "_deleted"):
        if req not in fields:
            raise ValueError(
                f"streaming_upsert_view needs a {req!r} column "
                "(stamp the changelog first — operators/cdc.py::"
                "stamp_changelog)"
            )
    payload_cols = [
        f.name
        for f in stream.schema.fields
        if f.name not in (pk_col, "_version", "_seq", "_deleted")
    ]
    out_schema = StructType(
        [fields[pk_col], fields["_version"], fields["_seq"],
         fields["_deleted"]]
        + [fields[c] for c in payload_cols]
    )
    state_schema = StructType(
        [
            StructField("version", fields["_version"].dataType),
            StructField("seq", fields["_seq"].dataType),
            StructField("deleted", fields["_deleted"].dataType),
        ]
        + [
            StructField(f"p{i}", fields[c].dataType)
            for i, c in enumerate(payload_cols)
        ]
    )
    return stream.groupBy(pk_col).applyInPandasWithState(
        _make_upsert_fn(pk_col, payload_cols),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
