"""Deterministic synthetic changelog derived from the ``orders`` table.

The reference's CDC input is the MySQL binlog — a stream of
Write/Update/Delete row events with full row images
(``/root/reference/src/cdc_replicator.py:157-212``).  The harness has
no MySQL, so we derive an equivalent event stream deterministically
from ``orders`` (seeded op assignment over ``o_orderkey``, per
FIXTURES.md §5/§6), covering every scenario the reference's semantics
must survive:

* seq 1 (U): every ``o_orderkey % 7 == 0`` gets a price-raised
  after-image — update shadows snapshot.
* seq 1 replayed twice — at-least-once duplicate delivery
  (``/root/reference/README.md:478-497``); dedup must absorb it.
* seq 2 (D): every ``o_orderkey % 7 == 1`` gets a tombstone.
* seq 3 (U): every ``o_orderkey % 14 == 0`` gets a second update —
  latest version wins over seq 1.
* seq 4 (I): every ``o_orderkey % 14 == 1`` is re-inserted after its
  delete (row live again with a marker priority); ``% 14 == 8`` rows
  stay deleted.

The exact same derivation is expressed in ANSI SQL for the DuckDB
oracle (see plans/cdc_queries.py) — scalar double arithmetic is
IEEE-deterministic so both engines produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDERS_PK = ("o_orderkey",)
REINSERT_MARKER = "5-REINSERTED"

_USER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _event_spec() -> list[tuple]:
    """The ONE definition of the derived event scenario:
    ``(valid, op, seq, price, prio)`` per emitted event, in delivery
    order.  Both derivations below (the raw changelog and the fused
    applied relation) consume this list, so the scenario cannot
    silently diverge between them; the SQL oracle twin lives in
    ``plans/cdc_queries.py::_ORACLE_CDC_CTES``.  The u1 event appears
    twice: duplicate delivery (at-least-once replay,
    ``/root/reference/README.md:478-497``).
    """
    key = F.col("o_orderkey")
    price = F.col("o_totalprice")
    prio = F.col("o_orderpriority")
    u1 = (key % 7 == 0, "U", 1, price * F.lit(1.1), prio)
    return [
        u1,
        u1,  # duplicate delivery: u1 replayed
        (key % 7 == 1, "D", 2, price, prio),
        (key % 14 == 0, "U", 3, price * F.lit(1.2), prio),
        (key % 14 == 1, "I", 4, price, F.lit(REINSERT_MARKER)),
    ]


def _user_fields(price, prio) -> list:
    return [
        F.col("o_orderkey").alias("o_orderkey"),
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        price.alias("o_totalprice"),
        F.col("o_orderdate").alias("o_orderdate"),
        prio.alias("o_orderpriority"),
    ]


def derive_orders_changelog(orders: DataFrame) -> DataFrame:
    """Build the raw changelog DataFrame ``(op, seq, <user cols>)``.

    SINGLE-SCAN derivation: each order row conditionally emits its
    events as an array of structs which is then exploded — one pass
    over the table instead of four filtered scans union'd together
    (the rows produced are identical; at 100 TB the 4 saved scans are
    the difference between one read of the table and five).
    """

    def ev(valid, op: str, seq: int, price, prio):
        # NULL struct when the row does not emit this event;
        # array_compact drops the NULLs.  when/struct/array_compact
        # are all ordinary codegen-friendly expressions — an earlier
        # HOF-lambda filter formulation ran interpreted and halved
        # the bench's CDC apply throughput.
        return F.when(
            valid,
            F.struct(
                F.lit(op).alias("op"),
                F.lit(seq).cast("long").alias("seq"),
                *_user_fields(price, prio),
            ),
        )

    events = F.array_compact(F.array(*[ev(*spec) for spec in _event_spec()]))
    return orders.select(F.explode(events).alias("_e")).select("_e.*")


def snapshot_with_cdc_columns(orders: DataFrame) -> DataFrame:
    """Initial snapshot stamped at version 0 (parity: C5,
    /root/reference/src/cdc_replicator.py:263-278 — one version per
    table's snapshot copy, ``_deleted = 0``)."""
    return orders.select(*_USER_COLS).withColumn(
        "_version", F.lit(0).cast("long")
    ).withColumn("_deleted", F.lit(0))


def applied_orders_single_scan(orders: DataFrame) -> DataFrame:
    """snapshot ∪ stamped changelog, derived in ONE pass over orders.

    Every applied row — the version-0 snapshot image AND all of the
    row's events — comes from the SAME source row, so one conditional
    struct array per row covers the whole applied relation: the table
    is read ONCE instead of twice (snapshot scan + changelog scan).
    At 100 TB that halves the read for every merge-on-read consumer
    (`cdc_live_orders`, compaction, SCD-2 history).  The emitted rows
    are exactly `cdc_apply(snapshot_with_cdc_columns(orders),
    stamp_changelog(derive_orders_changelog(orders)))` — same
    expressions, same arithmetic, null `_seq` on the snapshot image —
    asserted row-identical in tests; only the scan count differs
    (pinned in tests/test_plans.py).  The SAME ``_event_spec`` drives
    this and :func:`derive_orders_changelog`, with the stamping rule
    (``_version = seq``, ``_deleted = (op == 'D')``, null ``_seq`` on
    the snapshot image) applied inline, so the scenario cannot
    diverge between the two derivations.
    """

    def row(valid, version, deleted, seq, price, prio):
        return F.when(
            valid,
            F.struct(
                *_user_fields(price, prio),
                F.lit(version).cast("long").alias("_version"),
                F.lit(deleted).alias("_deleted"),
                F.lit(seq).cast("long").alias("_seq"),
            ),
        )

    snap = row(
        F.lit(True), 0, 0, None,
        F.col("o_totalprice"), F.col("o_orderpriority"),
    )
    rows = F.array_compact(
        F.array(
            snap,
            *[
                # stamp_changelog's rule, applied at derivation time
                row(valid, seq, 1 if op == "D" else 0, seq, price, prio)
                for valid, op, seq, price, prio in _event_spec()
            ],
        )
    )
    return orders.select(F.explode(rows).alias("_r")).select("_r.*")
