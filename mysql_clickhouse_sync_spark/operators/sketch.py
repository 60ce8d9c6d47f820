"""Mergeable sketches: count-min, HyperLogLog, theta/KMV.

A training-data pipeline at 100 TB tracks per-key frequencies (URLs,
domains, users, n-grams) where exact per-key state is too large and
``approx_count_distinct`` answers the wrong question.  A count-min
sketch is a (depth x width) counter matrix: each key increments one
counter per row via independent hashes; a point estimate is the MIN of
its counters — always >= the true count, with overestimate bounded by
(e/width) * total_mass at confidence 1 - (1/2)^depth.

HyperLogLog (Flajolet et al. 2007) estimates distinct counts from m =
2^p one-byte registers; Spark's own ``approx_count_distinct`` is an
HLL++, but its binary sketch is opaque — you cannot persist it as a
table, merge yesterday's sketch with today's increment, or diff two of
them.  Here the sketch IS a relation ``(group..., reg_idx, max_rank)``
with the same incremental-maintenance story as the rollup operator:
build = one bounded-cardinality shuffle, merge = union + max.

As a DataFrame the sketch IS a relation ``(row_idx, col_idx, cnt)``:

* build = one explode(depth) + one groupBy — a single shuffle whose
  cardinality is bounded by depth x width, NOT by key cardinality;
* merge = unionByName + sum (associative), same shape as
  operators/rollup.py partial state — incremental maintenance free;
* estimate = min over depth joined counters.

Hashes are xxhash64 with literal per-row salts — deterministic across
runs and partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_COLS = ("row_idx", "col_idx", "cnt")


def _col_idx(key: Column, row: int, width: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(f"cms-{row}")), F.lit(width)).cast(
        "int"
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch relation from one pass over the keys."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_idx"),
                _col_idx(F.col(key_col), r, width).alias("col_idx"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rc"))
        .groupBy(
            F.col("_rc.row_idx").alias("row_idx"),
            F.col("_rc.col_idx").alias("col_idx"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width)."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a set of keys: min over the depth counters.
    Missing counters mean the (row, col) was never touched -> 0."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        _col_idx(F.col(key_col), r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rc"),
    ).select(key_col, "_rc.row_idx", "_rc.col_idx")
    joined = probes.join(
        F.broadcast(sketch), on=["row_idx", "col_idx"], how="left"
    ).fillna({"cnt": 0})
    return joined.groupBy(key_col).agg(
        F.min("cnt").cast("long").alias("est_count")
    )


# --------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------

HLL_COLS = ("reg_idx", "max_rank")


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Build per-group HLL register relations in one bounded shuffle.

    The 64-bit xxhash of the key splits into a p-bit register index and
    a (64-p)-bit suffix w; the register keeps the max over rank(w) =
    position of w's leftmost 1-bit (w = 0 -> 64 - p + 1).  rank is
    computed as ``length(bin(w)) - 1`` — pure integer, no float log2,
    so the relation is bit-for-bit deterministic.  Output cardinality
    is bounded by |groups| * 2^p regardless of key cardinality.
    """
    group_cols = group_cols or []
    m = 1 << p
    h = F.xxhash64(F.col(key_col))
    reg = h.bitwiseAND(F.lit(m - 1).cast("long")).cast("int")
    w = F.shiftrightunsigned(h, p)
    rank = (
        F.when(w == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64 - p) - (F.length(F.bin(w)) - F.lit(1)))
        .cast("int")
    )
    return (
        df.select(*group_cols, reg.alias("reg_idx"), rank.alias("_rank"))
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("_rank").alias("max_rank"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register relations built with identical p: union + max.
    Associative and idempotent — replayed increments are absorbed."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def hll_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Distinct-count estimate per group from a register relation.

    The harmonic mean sum(2^-rank) is computed EXACTLY: each term is
    scaled to the integer 2^(R - rank) (R = 64 - p + 1, the max rank)
    and summed as DECIMAL(38,0) — associative, so the estimate never
    flaps with shuffle order; the single double division happens last.
    Registers absent from the relation are untouched (rank 0, term
    2^R), counted via m - n_present; those zero registers also drive
    the standard small-range linear-counting correction
    (E <= 2.5m and V > 0  ->  m * ln(m / V)).
    """
    group_cols = group_cols or []
    m = 1 << p
    R = 64 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # shiftleft() the builtin wants a literal shift; the SQL form takes
    # an expression.  2^(R - rank) <= 2^52 fits a long exactly.
    scaled_term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {R} - max_rank)"
        " AS DECIMAL(38,0))"
    )
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(scaled_term).alias("_s_present"),
        F.count("*").alias("_n_present"),
    )
    zeros = F.lit(m) - F.col("_n_present")
    denom = (
        F.col("_s_present")
        + zeros.cast("decimal(38,0)") * F.lit(1 << R).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(alpha * m * m * float(1 << R)) / denom
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(corrected).cast("long").alias("est_distinct")
    )


# --------------------------------------------------------------------
# Theta / KMV (k minimum values)
# --------------------------------------------------------------------

THETA_COLS = ("hv",)
_HV_SPAN = float(1 << 63)  # hv lives in [0, 2^63): xxhash64 >>> 1
# "exact mode" sentinel: max long.  A real hv can collide with it only
# with probability 2^-63 per key — accepted and documented.
_HV_SENTINEL = (1 << 63) - 1


def theta_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    prefilter: bool = True,
) -> DataFrame:
    """Per-group KMV theta sketch: the k smallest distinct 63-bit key
    hashes, as a relation ``(group..., hv)``.

    HLL answers only "how many distinct"; a theta sketch additionally
    supports INTERSECTION and DIFFERENCE estimates (Dasgupta et al.,
    "Theta-Sketch Framework", and the Apache DataSketches theta
    family), because it retains an actual uniform sample of the hash
    space below a threshold.

    Plan shape: distinct on (group, hv) — partial aggregation makes the
    map side bounded — then a per-group bottom-k.  The bottom-k window
    sorts each group on ONE task, so for huge groups ``prefilter``
    first bounds the sort input: a cheap ``approx_count_distinct``
    per group (HLL, no extra shuffle of data rows) sets a hash cutoff
    at ~8k expected survivors; P(cutting below the true k-th min) ~
    P(Binomial(d, 8k/d) < k) < e^-k — negligible for k >= 64.  That
    keeps every stage bounded at 100 TB: the sketch relation is at
    most |groups| * k rows regardless of key cardinality.

    Determinism: xxhash64 is seed-fixed, distinct + bottom-k are
    order-insensitive, approx_count_distinct is a register-max HLL
    (order-insensitive) -> the relation is bit-for-bit reproducible.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    hv = F.shiftrightunsigned(F.xxhash64(F.col(key_col)), 1)
    pts = df.select(*group_cols, hv.alias("hv")).distinct()
    if prefilter:
        est = df.groupBy(*group_cols).agg(
            F.approx_count_distinct(key_col).alias("_d")
        )
        cutoff = F.when(
            F.col("_d") > 8 * k,
            (F.lit(_HV_SPAN * 8 * k) / F.col("_d")).cast("long"),
        ).otherwise(F.lit(_HV_SENTINEL).cast("long"))
        bound = est.select(*group_cols, cutoff.alias("_cut"))
        if group_cols:
            pts = pts.join(F.broadcast(bound), on=group_cols, how="inner")
        else:
            pts = pts.crossJoin(F.broadcast(bound))
        pts = pts.filter(F.col("hv") < F.col("_cut")).drop("_cut")
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("hv")
    return (
        pts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def theta_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Union two sketches built with identical k: distinct hashes,
    keep the k smallest per group.  Associative + idempotent (replays
    absorbed), same contract as hll_merge."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("hv")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _theta_state(
    sketch: DataFrame, group_cols: list[str], k: int, suffix: str
) -> DataFrame:
    """Per-group (n, theta): theta = k-th smallest hash when the sketch
    is full, else 2^63 (sketch holds the whole key set — exact mode)."""
    return sketch.groupBy(*group_cols).agg(
        F.count("*").alias(f"_n{suffix}"),
        F.when(F.count("*") < k, F.lit(_HV_SENTINEL))
        .otherwise(F.max("hv"))
        .cast("long")
        .alias(f"_theta{suffix}"),
    )


def theta_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Distinct-count estimate per group.

    Full sketch: (k-1) / normalized(k-th min) — the classic unbiased
    KMV estimator; under-full sketch: the count itself (exact, the
    sketch saw every distinct hash).  One double division at the end.
    """
    group_cols = group_cols or []
    st = _theta_state(sketch, group_cols, k, "")
    est = F.when(
        F.col("_theta") >= _HV_SENTINEL, F.col("_n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HV_SPAN) / F.col("_theta").cast("double")
    )
    return st.select(
        *group_cols, F.round(est).cast("long").alias("est_distinct")
    )


def theta_estimate_bounds(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
    num_std: float = 2.0,
) -> DataFrame:
    """Distinct-count estimate WITH confidence bounds per group.

    The KMV estimator's relative standard error is 1/sqrt(k-2)
    (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    Multiset Operations", SIGMOD'07; same bound the Apache
    DataSketches theta library reports).  Bounds follow the
    DataSketches convention: est / (1 + z*rse) .. est * (1 + z*rse).
    In the under-full (exact) regime the bounds collapse to the count
    itself — callers can detect estimation kicking in by lb != ub.

    Output: (group..., est_distinct, lb_distinct, ub_distinct).
    """
    group_cols = group_cols or []
    st = _theta_state(sketch, group_cols, k, "")
    exact = F.col("_theta") >= _HV_SENTINEL
    est = F.when(exact, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HV_SPAN) / F.col("_theta").cast("double")
    )
    rse = float(num_std) / ((k - 2) ** 0.5)
    lb = F.when(exact, est).otherwise(est / F.lit(1.0 + rse))
    ub = F.when(exact, est).otherwise(est * F.lit(1.0 + rse))
    return st.select(
        *group_cols,
        F.round(est).cast("long").alias("est_distinct"),
        F.floor(lb).cast("long").alias("lb_distinct"),
        F.ceil(ub).cast("long").alias("ub_distinct"),
    )


def theta_set_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
    pinned: bool = False,
) -> DataFrame:
    """Per-group union / intersection / difference distinct estimates
    from two theta sketches — the operation HLL structurally cannot do
    (registers carry no membership).

    Theta framework: theta = min(theta_a, theta_b); every retained
    hash below theta is a uniform sample of the combined key space at
    rate theta/2^63, so |sample ∩| / rate estimates the true
    intersection, and likewise for union and A\\B.  When both sketches
    are under-full (theta = 2^63) every count is exact.

    Output: (group..., est_union, est_intersect, est_diff_a, est_diff_b).
    """
    group_cols = group_cols or []
    on = group_cols if group_cols else None
    # Materialize each sketch ONCE: this function references `a` and
    # `b` from multiple branches (state, theta, membership), and
    # DataFrame branches re-evaluate their subtree per reference — the
    # un-checkpointed plan re-ran each build (scan + distinct +
    # bottom-k) EIGHT times, 16 source scans total for the ungrouped
    # case (caught by tools/plan_audit.py).  A sketch is bounded at
    # |groups| * k rows BY DESIGN, so eager materialization is O(k)
    # — same precedent as the edge list in operators/graph.py.
    # ``pinned=True`` = the caller already materialized both inputs
    # (e.g. slices of one checkpointed grouped build) — re-pinning
    # would add two no-op barrier jobs.
    if not pinned:
        a = a.localCheckpoint(eager=True)
        b = b.localCheckpoint(eager=True)
    # Both side states from ONE aggregation over the tagged union
    # (r14): the per-side _theta_state pair + outer join/cross join
    # cost three exchanges over relations this function just pinned;
    # conditional aggregates over a side tag produce the identical
    # (n, theta) per side in one.  An absent side has _n = 0 < k ->
    # theta = sentinel, exactly the old outer-join coalesce.
    tagged = a.select(
        *group_cols, "hv", F.lit(1).alias("_ia"), F.lit(0).alias("_ib")
    ).unionByName(
        b.select(
            *group_cols, "hv", F.lit(0).alias("_ia"), F.lit(1).alias("_ib")
        )
    )

    def _side_theta(n_col: str, mx_col: str):
        return (
            F.when(F.col(n_col) < k, F.lit(_HV_SENTINEL))
            .otherwise(F.col(mx_col))
            .cast("long")
        )

    # coalesce(sum, 0): the ungrouped BOTH-EMPTY case aggregates zero
    # rows into one row whose sums are SQL NULL — the side-count must
    # read 0 there so the side theta takes the under-full (exact)
    # sentinel branch (r14 ADVICE pin: two empty inputs are exact
    # sketches of empty sets, result = one all-zero exact row).
    st = tagged.groupBy(*group_cols).agg(
        F.coalesce(F.sum("_ia"), F.lit(0)).alias("_n_a"),
        F.coalesce(F.sum("_ib"), F.lit(0)).alias("_n_b"),
        F.max(F.when(F.col("_ia") == 1, F.col("hv"))).alias("_mx_a"),
        F.max(F.when(F.col("_ib") == 1, F.col("hv"))).alias("_mx_b"),
    )
    thetas = st.select(
        *group_cols,
        F.least(
            _side_theta("_n_a", "_mx_a"), _side_theta("_n_b", "_mx_b")
        ).alias("_theta"),
    )

    # Membership via the SAME tagged union + two-level aggregation,
    # NOT a full-outer join: a full outer cannot broadcast either
    # side, so Spark plans a sort-merge join (two sorts) even for
    # these bounded sketch relations; the union form is one hash
    # aggregation keyed on (group, hv) with map-side combine and no
    # sort at all — identical (in_a, in_b) membership per retained
    # hash.  The theta cut runs BEFORE the aggregation, as the old
    # per-side `below` joins did.
    cut = (
        tagged.join(F.broadcast(thetas), on=on, how="inner")
        if on
        else tagged.crossJoin(F.broadcast(thetas))
    ).filter(F.col("hv") < F.col("_theta"))
    merged = (
        cut.groupBy(*group_cols, "hv")
        .agg(
            F.max("_ia").alias("_in_a"),
            F.max("_ib").alias("_in_b"),
        )
    )
    # coalesce(sum, 0): the ungrouped BOTH-EMPTY case aggregates zero
    # rows into one row — count(*) is 0 but SQL sums are NULL there,
    # and the intended contract (r14 ADVICE pin) is an all-zero EXACT
    # row (two empty inputs are under-full sketches of empty sets).
    # Non-empty groups never hit the coalesce.
    counts = merged.groupBy(*group_cols).agg(
        F.count("*").alias("_n_union"),
        F.coalesce(
            F.sum(
                F.when((F.col("_in_a") == 1) & (F.col("_in_b") == 1), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).alias("_n_inter"),
        F.coalesce(
            F.sum(
                F.when((F.col("_in_a") == 1) & (F.col("_in_b") == 0), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).alias("_n_only_a"),
        F.coalesce(
            F.sum(
                F.when((F.col("_in_b") == 1) & (F.col("_in_a") == 0), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).alias("_n_only_b"),
    )
    out = counts.join(F.broadcast(thetas), on=on) if on else counts.crossJoin(
        F.broadcast(thetas)
    )
    rate = F.col("_theta").cast("double") / F.lit(_HV_SPAN)

    def scaled(c: str):
        return F.round(F.col(c).cast("double") / rate).cast("long")

    return out.select(
        *group_cols,
        scaled("_n_union").alias("est_union"),
        scaled("_n_inter").alias("est_intersect"),
        scaled("_n_only_a").alias("est_diff_a"),
        scaled("_n_only_b").alias("est_diff_b"),
    )
