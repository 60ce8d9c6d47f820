"""Property-based CDC semantics: for ANY changelog, the live view must
equal a trivial Python last-writer-wins model, and re-applying the
changelog (at-least-once replay) must not change the answer.

Few examples, sizeable coverage per example — Spark round-trips are
the expensive part, so hypothesis drives the changelog shape, not the
row count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_clickhouse_sync_spark.operators.cdc import (
    cdc_apply,
    dedup_latest,
    live_view,
    stamp_changelog,
)

EVENT = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=9),      # key
    st.integers(min_value=0, max_value=99),     # payload
)
CHANGELOG = st.lists(EVENT, min_size=0, max_size=30)


def _model_live(events):
    """Python reference model: last event per key wins; deletes hide."""
    state: dict[int, tuple[str, int]] = {}
    for op, key, val in events:
        state[key] = (op, val)
    return {
        k: v for k, (op, v) in state.items() if op != "D"
    }


def _spark_live(spark, events):
    rows = [
        (op, seq + 1, key, val) for seq, (op, key, val) in enumerate(events)
    ]
    if not rows:
        return {}
    changes = stamp_changelog(
        spark.createDataFrame(rows, "op string, seq long, id long, v long"),
        op_col="op",
        seq_col="seq",
    )
    empty = spark.createDataFrame([], changes.schema)
    return {
        r["id"]: r["v"]
        for r in live_view(cdc_apply(empty, changes), ["id"]).collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(CHANGELOG)
def test_live_view_matches_model(spark, events):
    assert _spark_live(spark, events) == _model_live(events)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(CHANGELOG)
def test_replay_is_idempotent(spark, events):
    """apply(x ++ x) and apply(x) give the same live state — the
    at-least-once tolerance the whole design rests on."""
    rows = [
        (op, seq + 1, key, val) for seq, (op, key, val) in enumerate(events)
    ]
    if not rows:
        return
    changes = stamp_changelog(
        spark.createDataFrame(rows, "op string, seq long, id long, v long"),
        op_col="op",
        seq_col="seq",
    )
    empty = spark.createDataFrame([], changes.schema)
    once = cdc_apply(empty, changes)
    twice = cdc_apply(once, changes)
    live_once = sorted(map(tuple, live_view(once, ["id"]).collect()))
    live_twice = sorted(map(tuple, live_view(twice, ["id"]).collect()))
    assert live_once == live_twice
    # compacted state also agrees (tombstones included)
    c1 = sorted(map(tuple, dedup_latest(once, ["id"]).collect()))
    c2 = sorted(map(tuple, dedup_latest(twice, ["id"]).collect()))
    assert c1 == c2
