"""Skew mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most hot-key
joins at runtime, but two cases still need explicit salting at 100 TB:

* a shuffle join where one key holds a double-digit percentage of the
  fact table (AQE splits partitions, but a single key still lands in
  one partition per side);
* high-cardinality aggregation state per key (``collect_list``,
  ``count distinct``) where partial aggregation cannot shrink the hot
  key's state.

``salted_join`` replicates the (small-but-not-broadcastable) build
side ``n_salts`` times and scatters the probe side's hot keys across
salt buckets; results are exactly equal to the plain join.
``two_phase_agg`` salts a skewed groupBy for algebraic aggregates:
partial per (key, salt), final per key.

Salts are derived deterministically from row content (``xxhash64``),
never from ``rand()`` — retried tasks must salt identically or
shuffle-replay under fault recovery would duplicate/lose rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _content_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts) from all columns."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).cast("int")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe rows scatter across n_salts
    buckets; the build side is replicated once per bucket (explode of a
    literal range — a narrow op, no driver round-trip).  Equivalent to
    ``probe.join(build, keys, how)`` for inner/left joins keyed on
    ``keys``; the hot key's work now spreads over n_salts partitions.

    Use when BOTH sides are too big to broadcast and a handful of keys
    dominate; cost is n_salts x |build| shuffle volume, so pick the
    smaller side as ``build``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salted_probe = probe.withColumn(_SALT, _content_salt(probe, n_salts))
    salted_build = build.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = salted_probe.join(salted_build, [*keys, _SALT], how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys, salt) and computes ``partial_aggs``;
    phase 2 groups by keys and combines with ``final_aggs`` (which
    reference the phase-1 output names).  For algebraic aggregates
    (sum/count/min/max) this bounds any single reducer's input to
    ~1/n_salts of the hot key.
    """
    salted = df.withColumn(_SALT, _content_salt(df, n_salts))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )
