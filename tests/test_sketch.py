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


# --------------------------------------------------------------------
# Theta / KMV
# --------------------------------------------------------------------


def _ids(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(F.col("id").alias(name))


def test_theta_exact_when_underfull(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_estimate,
    )

    df = _ids(spark, 0, 100)
    sk = theta_build(df, "k", k=256)
    assert sk.count() == 100  # sketch holds every distinct hash
    est = theta_estimate(sk, k=256).collect()
    assert est[0].est_distinct == 100


def test_theta_accuracy_full_sketch(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_estimate,
    )

    n = 20_000
    for prefilter in (False, True):
        sk = theta_build(_ids(spark, 0, n), "k", k=512, prefilter=prefilter)
        assert sk.count() == 512
        est = theta_estimate(sk, k=512).collect()[0].est_distinct
        # KMV RSE ~ 1/sqrt(k-1) ~ 4.4%; allow 3 sigma
        assert abs(est - n) < 0.14 * n, (prefilter, est)


def test_theta_bounds_exact_regime_collapse(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_estimate_bounds,
    )

    sk = theta_build(_ids(spark, 0, 100), "k", k=256)
    row = theta_estimate_bounds(sk, k=256).collect()[0]
    assert row.est_distinct == row.lb_distinct == row.ub_distinct == 100


def test_theta_bounds_cover_truth_when_estimating(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_estimate_bounds,
    )

    n = 20_000
    sk = theta_build(_ids(spark, 0, n), "k", k=512)
    row = theta_estimate_bounds(sk, k=512, num_std=3.0).collect()[0]
    assert row.lb_distinct < row.est_distinct < row.ub_distinct
    assert row.lb_distinct <= n <= row.ub_distinct  # 3-sigma interval
    # interval width matches the advertised RSE (~ 2*3/sqrt(510) ~ 27%)
    assert row.ub_distinct - row.lb_distinct < 0.35 * n


def test_theta_prefilter_matches_unfiltered_exactly(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import theta_build

    df = _ids(spark, 0, 50_000)
    plain = sorted(r.hv for r in theta_build(df, "k", k=128,
                                             prefilter=False).collect())
    pre = sorted(r.hv for r in theta_build(df, "k", k=128,
                                           prefilter=True).collect())
    assert plain == pre  # cutoff is a pure optimization, never lossy here


def test_theta_merge_equals_single_build_and_idempotent(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_merge,
    )

    df = _ids(spark, 0, 5000)
    a = theta_build(df.filter(F.col("k") % 2 == 0), "k", k=64)
    b = theta_build(df.filter(F.col("k") % 2 == 1), "k", k=64)
    merged = sorted(r.hv for r in theta_merge(a, b, k=64).collect())
    single = sorted(r.hv for r in theta_build(df, "k", k=64).collect())
    assert merged == single
    twice = sorted(
        r.hv for r in theta_merge(theta_merge(a, b, k=64), b, k=64).collect()
    )
    assert twice == single


def test_theta_set_ops_exact_mode(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_set_estimate,
    )

    a = theta_build(_ids(spark, 0, 150), "k", k=256)
    b = theta_build(_ids(spark, 100, 300), "k", k=256)
    r = theta_set_estimate(a, b, k=256).collect()[0]
    # both sketches under-full -> every number exact
    assert (r.est_union, r.est_intersect, r.est_diff_a, r.est_diff_b) == (
        300, 50, 100, 150,
    )


def test_theta_set_ops_estimation_mode(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_set_estimate,
    )

    # |A| = 30k, |B| = 30k, overlap 10k
    a = theta_build(_ids(spark, 0, 30_000), "k", k=512)
    b = theta_build(_ids(spark, 20_000, 50_000), "k", k=512)
    r = theta_set_estimate(a, b, k=512).collect()[0]
    assert abs(r.est_union - 50_000) < 0.15 * 50_000
    assert abs(r.est_intersect - 10_000) < 0.30 * 10_000
    assert abs(r.est_diff_a - 20_000) < 0.20 * 20_000
    assert abs(r.est_diff_b - 20_000) < 0.20 * 20_000
    # identity holds in sample space (same theta scales all four); each
    # estimate rounds independently, so allow 1 ulp per term
    assert abs(
        r.est_union - (r.est_intersect + r.est_diff_a + r.est_diff_b)
    ) <= 3


def test_theta_grouped_build_and_set_ops(spark):
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_estimate,
        theta_set_estimate,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") / 2).cast("long").alias("k"),  # 2000 distinct per group
    )
    sk = theta_build(df, "k", group_cols=["g"], k=128)
    assert sk.groupBy("g").count().agg(F.max("count")).collect()[0][0] <= 128
    est = {r.g: r.est_distinct
           for r in theta_estimate(sk, ["g"], k=128).collect()}
    for g in ("0", "1"):
        assert abs(est[g] - 2000) < 0.30 * 2000
    other = theta_build(df.filter(F.col("k") < 500), "k",
                        group_cols=["g"], k=128)
    r = {row.g: row for row in
         theta_set_estimate(sk, other, ["g"], k=128).collect()}
    for g in ("0", "1"):
        # B subset of A: diff_b must be (near) zero, intersect ~ |B|
        assert r[g].est_diff_b == 0
        assert abs(r[g].est_intersect - 500) < 0.45 * 500


def test_grouped_theta_build_equals_per_filter_builds(spark):
    """A per-group theta sketch slices to exactly the per-filter
    sketch of each group — the identity events_theta_user_overlap's
    one-pass grouped build (r14) relies on."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.sketch import theta_build

    pdf = pd.DataFrame(
        {
            "user_id": [i % 37 for i in range(500)],
            "event_type": [
                ("view", "purchase", "click")[i % 3] for i in range(500)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    k = 16
    grouped = theta_build(
        df.filter(F.col("event_type").isin("view", "purchase")),
        "user_id",
        group_cols=["event_type"],
        k=k,
    )
    for etype in ("view", "purchase"):
        single = sorted(
            r["hv"]
            for r in theta_build(
                df.filter(F.col("event_type") == etype), "user_id", k=k
            ).collect()
        )
        sliced = sorted(
            r["hv"]
            for r in grouped.filter(
                F.col("event_type") == etype
            ).collect()
        )
        assert sliced == single, etype


def test_theta_set_ops_empty_side_and_both_empty(spark):
    """r14 ADVICE pin: the tagged-union rewrite changed the ungrouped
    edge cases — an empty side now returns ONE row (the old per-side
    crossJoin returned zero), and two empty sides return one row of
    exact zeros.  Pin the INTENDED semantics: an empty side is an
    exact (under-full) sketch of the empty set, so the result row is
    exact counts, never an estimate."""
    from mysql_clickhouse_sync_spark.operators.sketch import (
        theta_build,
        theta_set_estimate,
    )

    vals = spark.createDataFrame(
        [(i,) for i in range(100)], "v long"
    )
    empty = vals.filter("v < 0")
    sk_a = theta_build(vals, "v")
    sk_e = theta_build(empty, "v")
    # one side empty: union == |A| exactly, intersect == 0, diffs exact
    rows = theta_set_estimate(sk_a, sk_e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["est_union"] == 100
    assert r["est_intersect"] == 0
    assert r["est_diff_a"] == 100
    assert r["est_diff_b"] == 0
    # both sides empty: one all-zero exact row
    rows = theta_set_estimate(sk_e, sk_e.filter("1=1")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["est_union"] == 0 and r["est_intersect"] == 0
        and r["est_diff_a"] == 0 and r["est_diff_b"] == 0
    )
