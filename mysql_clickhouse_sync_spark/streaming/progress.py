"""Streaming progress reporting (O5 parity).

The reference logs snapshot progress every 10 batches and CDC
progress every 100 events (``/root/reference/src/replicator.py:59-61``,
``/root/reference/src/cdc_replicator.py:358-364``).  Structured
Streaming already emits a progress event per microbatch; this
listener turns that into the same throttled operator-facing log line
(events/sec, cumulative rows, batch id) and keeps running totals a
supervisor can read — driver-side observability only, zero effect on
the query plan.
"""

from __future__ import annotations

import sys

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogger(StreamingQueryListener):
    """Log one line every ``every_batches`` microbatches per query.

    Totals are per query-id and survive restarts of the listener's
    host process only — durable totals belong to the checkpoint, not
    the logger (same stance as the reference, which logs counters and
    persists only the binlog position).
    """

    def __init__(self, every_batches: int = 10, sink=None) -> None:
        self.every_batches = every_batches
        self.sink = sink if sink is not None else sys.stderr
        self.total_rows: dict[str, int] = {}
        self.batches: dict[str, int] = {}

    # -- StreamingQueryListener interface ---------------------------

    def onQueryStarted(self, event) -> None:
        print(f"stream {event.id} started", file=self.sink)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        self.batches[qid] = self.batches.get(qid, 0) + 1
        self.total_rows[qid] = (
            self.total_rows.get(qid, 0) + int(p.numInputRows)
        )
        if self.batches[qid] % self.every_batches == 0:
            rate = p.inputRowsPerSecond
            print(
                f"stream {qid}: batch {p.batchId}, "
                f"{self.total_rows[qid]} rows total"
                + (f", {rate:.0f} rows/s" if rate is not None else ""),
                file=self.sink,
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - passive
        # intentionally ignored: idle ticks carry no progress to log
        # and no fault to surface (QueryTerminated carries failures)
        pass

    def onQueryTerminated(self, event) -> None:
        qid = str(event.id)
        print(
            f"stream {qid} terminated: "
            f"{self.total_rows.get(qid, 0)} rows in "
            f"{self.batches.get(qid, 0)} batches",
            file=self.sink,
        )


def attach_progress_logger(
    spark, every_batches: int = 10, sink=None
) -> ProgressLogger:
    """Register a ProgressLogger on the session's streams and return
    it (caller detaches via ``spark.streams.removeListener``)."""
    listener = ProgressLogger(every_batches, sink)
    spark.streams.addListener(listener)
    return listener
