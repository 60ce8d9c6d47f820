"""CDC semantics tests: the FIXTURES.md §5 scenario matrix —
insert/update/delete/re-insert, replay idempotence, tie-breaking,
snapshot-overlap — over the `users_changelog` shape."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql_clickhouse_sync_spark.operators.cdc import (
    cdc_apply,
    compact,
    dedup_latest,
    live_view,
    register_live_view,
    stamp_changelog,
)

TS = datetime.datetime(2026, 1, 1)


def _changelog(spark, rows):
    return spark.createDataFrame(
        [Row(op=op, seq=seq, id=i, email=e, name=n) for op, seq, i, e, n in rows],
        "op string, seq long, id long, email string, name string",
    )


def _snapshot(spark, rows):
    df = spark.createDataFrame(
        [Row(id=i, email=e, name=n) for i, e, n in rows],
        "id long, email string, name string",
    )
    return df.withColumn("_version", F.lit(0).cast("long")).withColumn(
        "_deleted", F.lit(0)
    )


def _live_ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_insert_update_latest_wins(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    chg = stamp_changelog(
        _changelog(
            spark,
            [("U", 1, 1, "a@x", "Alice2"), ("U", 2, 1, "a@x", "Alice3")],
        ),
        seq_col="seq",
    )
    live = live_view(cdc_apply(base, chg), ["id"])
    rows = live.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "Alice3"


def test_insert_then_delete_excluded(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice"), (2, "b@x", "Bob")])
    chg = stamp_changelog(
        _changelog(spark, [("D", 1, 2, "b@x", "Bob")]), seq_col="seq"
    )
    live = live_view(cdc_apply(base, chg), ["id"])
    assert _live_ids(live) == [1]


def test_delete_then_reinsert_live_again(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    chg = stamp_changelog(
        _changelog(
            spark,
            [("D", 1, 1, "a@x", "Alice"), ("I", 2, 1, "a@x", "Alice-back")],
        ),
        seq_col="seq",
    )
    live = live_view(cdc_apply(base, chg), ["id"])
    rows = live.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "Alice-back"


def test_replay_idempotence(spark):
    """apply(apply(x)) == apply(x) — the at-least-once property
    (/root/reference/README.md:478-497)."""
    base = _snapshot(spark, [(1, "a@x", "Alice"), (2, "b@x", "Bob")])
    events = _changelog(
        spark,
        [("U", 1, 1, "a@x", "A2"), ("D", 2, 2, "b@x", "Bob")],
    )
    chg = stamp_changelog(events, seq_col="seq")
    once = live_view(cdc_apply(base, chg), ["id"])
    twice = live_view(cdc_apply(cdc_apply(base, chg), chg), ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_version_tie_deterministic_by_seq(spark):
    """Same _version, different _seq: the higher seq wins (the
    reference leaves ties arbitrary, /root/reference/README.md:495-497;
    we pin them)."""
    base = _snapshot(spark, [])
    chg = _changelog(
        spark, [("I", 1, 1, "a@x", "first"), ("U", 2, 1, "a@x", "second")]
    )
    # Force equal versions but distinct seq.
    stamped = stamp_changelog(chg, version_col="seq", seq_col="seq").withColumn(
        "_version", F.lit(5).cast("long")
    )
    live = live_view(cdc_apply(base, stamped), ["id"])
    assert live.collect()[0]["name"] == "second"


def test_composite_pk_dedup(spark):
    df = spark.createDataFrame(
        [
            Row(order_id=1, product_id=1, qty=5, _version=0, _deleted=0),
            Row(order_id=1, product_id=1, qty=9, _version=1, _deleted=0),
            Row(order_id=1, product_id=2, qty=3, _version=0, _deleted=0),
        ]
    )
    out = dedup_latest(df, ["order_id", "product_id"]).collect()
    got = {(r["order_id"], r["product_id"]): r["qty"] for r in out}
    assert got == {(1, 1): 9, (1, 2): 3}


def test_snapshot_overlap_duplicates_resolve(spark):
    """Initial-sync overlap: snapshot already contains the row AND the
    changelog replays the same insert (capture-position-before-copy,
    /root/reference/src/cdc_replicator.py:242-260)."""
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    chg = stamp_changelog(
        _changelog(spark, [("I", 1, 1, "a@x", "Alice")]), seq_col="seq"
    )
    live = live_view(cdc_apply(base, chg), ["id"])
    assert live.count() == 1


def test_nulls_in_nullable_columns(spark):
    base = _snapshot(spark, [(1, "a@x", None)])
    chg = stamp_changelog(
        _changelog(spark, [("U", 1, 1, "a@x", None)]), seq_col="seq"
    )
    live = live_view(cdc_apply(base, chg), ["id"])
    assert live.collect()[0]["name"] is None


def test_live_view_projects_system_columns_away(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    live = live_view(base, ["id"])
    assert set(live.columns) == {"id", "email", "name"}


def test_compact_keeps_tombstones_by_default(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    chg = stamp_changelog(
        _changelog(spark, [("D", 1, 1, "a@x", "Alice")]), seq_col="seq"
    )
    applied = cdc_apply(base, chg)
    compacted = compact(applied, ["id"])
    assert compacted.count() == 1
    assert compacted.collect()[0]["_deleted"] == 1
    assert compact(applied, ["id"], keep_tombstones=False).count() == 0


def test_register_live_view_sql_surface(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    register_live_view(base, "users", ["id"])
    assert spark.sql("SELECT count(*) c FROM users_live").collect()[0]["c"] == 1
    with pytest.raises(ValueError):
        register_live_view(base, "users; drop", ["id"])


def test_dedup_requires_keys(spark):
    base = _snapshot(spark, [(1, "a@x", "Alice")])
    with pytest.raises(ValueError):
        dedup_latest(base, [])


def test_scd2_history_intervals_chain(spark):
    from mysql_clickhouse_sync_spark.operators.cdc import scd2_history

    base = _snapshot(spark, [(1, "a@x", "Alice"), (2, "b@x", "Bob")])
    chg = stamp_changelog(
        _changelog(
            spark,
            [
                ("U", 1, 1, "a@x", "Alice2"),
                ("U", 1, 1, "a@x", "Alice2"),  # at-least-once replay
                ("U", 3, 1, "a@x", "Alice3"),
                ("D", 2, 2, "b@x", "Bob"),
            ],
        ),
        seq_col="seq",
    )
    hist = scd2_history(cdc_apply(base, chg), ["id"])
    rows = {
        (r["id"], r["valid_from"]): r for r in hist.collect()
    }
    # replay collapsed: one row per (key, version)
    assert len(rows) == 5
    # key 1: 0 -> 1 -> 3, open current at version 3
    assert rows[(1, 0)]["valid_to"] == 1
    assert rows[(1, 1)]["valid_to"] == 3
    assert rows[(1, 3)]["valid_to"] is None
    assert rows[(1, 3)]["is_current"] and rows[(1, 3)]["name"] == "Alice3"
    assert not rows[(1, 0)]["is_current"] and not rows[(1, 1)]["is_current"]
    # key 2: snapshot then tombstone -> closed interval, no current row
    assert rows[(2, 0)]["valid_to"] == 2
    assert rows[(2, 2)]["valid_to"] is None
    assert not rows[(2, 2)]["is_current"]  # tombstone is never current


def test_scd2_single_shuffle_plan(spark):
    from mysql_clickhouse_sync_spark.operators.cdc import scd2_history

    base = _snapshot(spark, [(1, "a@x", "Alice")])
    chg = stamp_changelog(
        _changelog(spark, [("U", 1, 1, "a@x", "A2")]), seq_col="seq"
    )
    plan = (
        scd2_history(cdc_apply(base, chg), ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Both windows partition on the PK: exactly one exchange.
    assert plan.count("Exchange") == 1, plan


def test_applied_single_scan_equals_two_scan_composition(spark):
    """applied_orders_single_scan must emit exactly the rows of the
    two-scan composition (snapshot ∪ stamped changelog) — same
    schema, same multiset of rows including the replayed u1 duplicate
    and NULL-_seq snapshot images."""
    from mysql_clickhouse_sync_spark.operators.cdc import (
        cdc_apply,
        stamp_changelog,
    )
    from mysql_clickhouse_sync_spark.sources.changelog import (
        applied_orders_single_scan,
        derive_orders_changelog,
        snapshot_with_cdc_columns,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    two = cdc_apply(
        snapshot_with_cdc_columns(orders),
        stamp_changelog(
            derive_orders_changelog(orders), op_col="op", seq_col="seq"
        ),
    )
    one = applied_orders_single_scan(orders)
    assert one.schema == two.schema
    assert one.exceptAll(two).count() == 0
    assert two.exceptAll(one).count() == 0
