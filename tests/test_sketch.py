"""Count-min sketch guarantees: estimates never undercount, exact for
skewed heavy hitters at this width, and merge(a, b) == build(a ++ b).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from mysql_clickhouse_sync_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from mysql_clickhouse_sync_spark.sources.parquet import load_table


def test_estimates_upper_bound_truth(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    sketch = cms_build(ev, "user_id")
    truth = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    est = cms_estimate(sketch, truth.select("user_id"), "user_id")
    rows = truth.join(est, "user_id").collect()
    assert rows
    assert all(r.est_count >= r.true_count for r in rows)
    # width 1024 >> distinct users at sf0.001: most estimates exact
    exact = sum(r.est_count == r.true_count for r in rows)
    assert exact / len(rows) > 0.9


def test_merge_equals_single_build(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    a = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = sorted(map(tuple, cms_merge(a, b).collect()))
    single = sorted(map(tuple, cms_build(ev, "user_id").collect()))
    assert merged == single


def test_hll_accuracy_and_registers(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    ev = load_table(spark, SF_DIR, "events")
    sketch = hll_build(ev, "user_id", ["event_type"], p=12)
    # register relation is bounded by |groups| * 2^p and ranks are sane
    regs = sketch.collect()
    assert all(0 <= r.reg_idx < 4096 and 1 <= r.max_rank <= 53 for r in regs)
    est = {
        r.event_type: r.est_distinct
        for r in hll_estimate(sketch, ["event_type"], p=12).collect()
    }
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(truth)
    for t, n in truth.items():
        # p=12 -> standard error 1.04/sqrt(4096) ~ 1.6%; allow 5%
        assert abs(est[t] - n) <= max(3, 0.05 * n), (t, est[t], n)


def test_hll_merge_equals_single_build_and_is_deterministic(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    a = hll_build(ev.filter(F.col("event_id") % 2 == 0), "user_id", p=12)
    b = hll_build(ev.filter(F.col("event_id") % 2 == 1), "user_id", p=12)
    merged = sorted(map(tuple, hll_merge(a, b).collect()))
    single = sorted(map(tuple, hll_build(ev, "user_id", p=12).collect()))
    assert merged == single
    # replay idempotence: merging the same increment twice changes nothing
    twice = sorted(map(tuple, hll_merge(hll_merge(a, b), b).collect()))
    assert twice == single
    e1 = hll_estimate(hll_build(ev, "user_id", p=12), p=12).collect()
    e2 = hll_estimate(hll_build(ev, "user_id", p=12), p=12).collect()
    assert [r.est_distinct for r in e1] == [r.est_distinct for r in e2]
