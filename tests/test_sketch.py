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
