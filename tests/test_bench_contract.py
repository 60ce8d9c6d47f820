"""bench.py contract pins: the timing lists must stay consistent with
the query registry, or the driver's per-round bench run dies at
runtime with a KeyError — after the round's work is already done."""

from __future__ import annotations


def test_bench_lists_resolve_against_registry():
    import bench
    from mysql_clickhouse_sync_spark.plans.registry import all_queries

    names = set(all_queries())
    missing = (set(bench.HEADLINE) | set(bench.EXTENDED)) - names
    assert not missing, f"bench names not in registry: {sorted(missing)}"


def test_bench_lists_are_disjoint_and_unique():
    import bench

    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.EXTENDED)) == len(bench.EXTENDED)
    overlap = set(bench.HEADLINE) & set(bench.EXTENDED)
    assert not overlap, (
        f"timed in both lists (double-counted): {sorted(overlap)}"
    )


def test_untimed_streaming_surfaces_are_only_the_disclosed_ones():
    """Every registered query is either timed (HEADLINE/EXTENDED) or
    graded-only streaming machinery (the disclosed drains) — pin the
    DISCLOSED untimed streaming set so a new heavyweight streaming
    row can't silently skip both the ledger and the timing lists."""
    import bench
    from mysql_clickhouse_sync_spark.plans.registry import all_queries

    timed = set(bench.HEADLINE) | set(bench.EXTENDED)
    streaming_rows = {
        n for n in all_queries() if "streaming" in n or "_mux" in n
    }
    untimed_streaming = streaming_rows - timed
    assert untimed_streaming == {
        "cdc_streaming_live",
        "events_streaming_hourly",
        "events_streaming_append",
        "events_streaming_dedup",
        "cdc_streaming_upsert",
        "events_streaming_interval_join",
        # r7: the left-outer twin — same correctness-surface policy
        "events_streaming_interval_join_outer",
        # r8: session windows + the multi-table mux dispatch drain +
        # mid-stream schema evolution — same policy: their cost is
        # checkpoint/trigger machinery, graded by the driver window
        # and window_fidelity, not timed
        "events_streaming_sessions",
        "events_streaming_enriched",
        "cdc_multi_table_mux",
        "cdc_mux_schema_evolution",
        # r9: the full-outer triplet completion + the mux crash-restart
        # recovery drain + the dead-letter split on the streaming
        # runtime — same policy
        "events_streaming_interval_join_full",
        "cdc_mux_restart_recovery",
        "orders_streaming_ingest_quarantine",
        # r10: the observe()-ledgered health monitor on the same
        # two-drain runtime — same policy (drain cost is checkpoint/
        # trigger machinery; the monitor itself adds zero feed scans)
        "orders_streaming_ingest_health",
        # r10: the DLQ re-drive as a second checkpointed stream over
        # the dead-letter sink — same policy
        "orders_streaming_ingest_redrive",
        # r10: column DROP + RENAME evolution on the mux runtime —
        # same policy as the other mux drains
        "cdc_mux_schema_drop",
    }, sorted(untimed_streaming)
