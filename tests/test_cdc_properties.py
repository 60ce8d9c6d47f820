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


def test_pk_changing_update_leaks_old_row_bug_compatibly(spark):
    """Reference fidelity (SURVEY.md §7 risk register): the reference
    applies UPDATE events as an append of ``after_values`` ONLY
    (``/root/reference/src/cdc_replicator.py:184`` — the before-image
    is discarded, no tombstone for the old key), so an UPDATE that
    changes the primary key leaves the OLD row live forever alongside
    the new one.  The engine's changelog contract reproduces this
    bug-compatibly: an ``op='U'`` row is just a new version of
    whatever key it carries, and since no event ever carried a delete
    for the old key, the old key survives in the live view.

    Scenario: INSERT (id=1, v=10), then a source-side
    ``UPDATE ... SET id=2`` arrives as U(id=2, v=10).  A
    semantics-fixing engine would emit live = {2}; the reference —
    and therefore this engine — emits live = {1, 2}.
    """
    events = [
        ("I", 1, 1, 10),   # seq 1: insert pk=1
        ("U", 2, 2, 10),   # seq 2: pk-changing update arrives as
                           # after-image only (pk=2) — no tombstone
    ]
    changes = stamp_changelog(
        spark.createDataFrame(
            events, "op string, seq long, id long, v long"
        ),
        op_col="op",
        seq_col="seq",
    )
    empty = spark.createDataFrame([], changes.schema)
    live = {
        r["id"]: r["v"]
        for r in live_view(cdc_apply(empty, changes), ["id"]).collect()
    }
    # bug-compatible: the pre-update row is still live under its old pk
    assert live == {1: 10, 2: 10}
    # and the Debezium adapter produces exactly this event shape from a
    # pk-changing update envelope (after-image only for op='u'):
    import json

    from pyspark.sql import Row
    from pyspark.sql.types import LongType, StructField, StructType

    from mysql_clickhouse_sync_spark.sources.debezium import parse_debezium

    env = json.dumps(
        {
            "payload": {
                "before": {"id": 1, "v": 10},
                "after": {"id": 2, "v": 10},
                "source": {"ts_ms": 2, "file": "b.1", "pos": 2,
                           "db": "d", "table": "t"},
                "op": "u",
                "ts_ms": 2,
            }
        }
    )
    schema = StructType(
        [StructField("id", LongType(), False),
         StructField("v", LongType(), True)]
    )
    raw = spark.createDataFrame([Row(value=env)], "value string")
    parsed = parse_debezium(raw, schema).collect()
    assert len(parsed) == 1
    assert (parsed[0]["op"], parsed[0]["id"]) == ("U", 2)
