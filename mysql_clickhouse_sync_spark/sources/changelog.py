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


def _event(df: DataFrame, op: str, seq: int) -> DataFrame:
    return df.select(
        F.lit(op).alias("op"),
        F.lit(seq).cast("long").alias("seq"),
        *[F.col(c) for c in _USER_COLS],
    )


def derive_orders_changelog(orders: DataFrame) -> DataFrame:
    """Build the raw changelog DataFrame ``(op, seq, <user cols>)``."""
    u1 = _event(
        orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
        ),
        "U",
        1,
    )
    d2 = _event(orders.filter(F.col("o_orderkey") % 7 == 1), "D", 2)
    u3 = _event(
        orders.filter(F.col("o_orderkey") % 14 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * F.lit(1.2)
        ),
        "U",
        3,
    )
    i4 = _event(
        orders.filter(F.col("o_orderkey") % 14 == 1).withColumn(
            "o_orderpriority", F.lit(REINSERT_MARKER)
        ),
        "I",
        4,
    )
    # u1 appears twice: duplicate delivery (at-least-once replay).
    return u1.unionByName(u1).unionByName(d2).unionByName(u3).unionByName(i4)


def snapshot_with_cdc_columns(orders: DataFrame) -> DataFrame:
    """Initial snapshot stamped at version 0 (parity: C5,
    /root/reference/src/cdc_replicator.py:263-278 — one version per
    table's snapshot copy, ``_deleted = 0``)."""
    return orders.select(*_USER_COLS).withColumn(
        "_version", F.lit(0).cast("long")
    ).withColumn("_deleted", F.lit(0))
