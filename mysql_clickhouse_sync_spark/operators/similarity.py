"""Vector similarity search over an embedding column (array<float>).

Two paths, per the standard ANN playbook:

* **brute-force top-k** — exact baseline: broadcast the (small) query
  set against the corpus; per-pair cosine via higher-order functions
  (``zip_with`` + ``aggregate`` — a sequential left fold, so the
  float math is reproducible and oracle-comparable).  At 100 TB the
  corpus side stays partitioned; work is |corpus| x |queries| narrow
  compute followed by a per-query top-k window.
* **LSH-bucketed (random hyperplanes)** — the scale path: an r-bit
  signature from sign(v . h_i) with deterministic pseudo-random
  hyperplanes derived from xxhash64, bucketed equi-join, cosine only
  within buckets.  Sub-quadratic candidate generation like
  MinHash-LSH for text.

Plus an IVF coarse quantizer (sub-linear probe path) and a
vectorized Arrow->numpy twin of the brute-force path: the fold stays
the oracle-reproducible reference, the matmul is the BLAS-rate scale
path (per-partition local top-k, O(k x partitions) shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import spread

# Bounded-side contracts.  The query set is broadcast / collected and
# the IVF coarse quantizer is collected driver-side — both are small
# BY DESIGN, but a caller passing the whole corpus as "queries" would
# silently OOM the driver at scale.  These caps fail fast instead;
# raise them explicitly via the max_queries parameter if a deployment
# really wants a bigger broadcast side.
MAX_QUERY_ROWS = 65_536
MAX_CENTROIDS = 65_536


def _require_small(df: DataFrame, max_rows: int, what: str) -> None:
    """Assert the bounded-side contract WITHOUT scanning the full
    side: ``limit(max+1).count()`` stops reading at max+1 rows."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what} violates the bounded-side contract: > {max_rows} "
            f"rows would be collected/broadcast to the driver. Pass a "
            f"smaller set (or raise the bound explicitly)."
        )


def _collect_bounded(df: DataFrame, max_rows: int, what: str) -> list:
    """Collect a side that is small BY CONTRACT, folding the guard
    into the collect itself (no extra job): ``limit(max+1)`` stops the
    scan, and a ``max+1``-th surviving row proves the violation."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{what} violates the bounded-side contract: > {max_rows} "
            f"rows would be collected to the driver. Pass a smaller "
            f"set (or raise the bound explicitly)."
        )
    return rows


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _sql_double_literals(vals) -> str:
    """Comma-joined double literals for folding a trained constant
    (quantizer centroid / LSH hyperplane) into ONE parsed SQL
    expression.  Non-finite components are rejected up front with the
    real cause: ``repr(nan/inf)`` renders as ``'nan'``/``'inf'``,
    which fails to PARSE at plan construction with an opaque syntax
    error (the prior Column-API ``F.lit`` path tolerated them), and a
    NaN component means a corrupt embedding reached training — the
    fix belongs at ingest, not in a parser stack trace."""
    import math

    out = []
    for x in vals:
        f = float(x)
        if not math.isfinite(f):
            raise ValueError(
                f"non-finite component {f!r} in a plan-folded constant: "
                "a NaN/Inf embedding reached quantizer/hyperplane "
                "training — filter or sanitize the embedding column "
                "before building the index"
            )
        out.append(repr(f) + "D")
    return ",".join(out)


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (IEEE-deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rnk).  The query side
    is broadcast (small by construction); the corpus is never
    collected.  Top-k is a ranking window partitioned by query —
    shuffle size is |corpus| x |queries| pair rows, bounded by
    pre-filtering if the caller passes a candidate subset.
    """
    _require_small(queries, max_queries, "brute_force_topk query set")
    # Norms are materialized ONCE per row in each side's projection:
    # cosine() inline would re-run both norm folds per PAIR (the folds
    # are interpreted per element — 3x the work on |c| x |q| pairs,
    # measured ~2x wall-clock on this operator).  dot/(qn*cn) is the
    # identical float expression tree, so results stay bit-equal.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cn", norm(F.col("_cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("_qn", norm(F.col("_qv")))
    from pyspark.sql import Window

    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def _integral_id_types():
    """SQL/numpy type pairs for integral id columns — ONE shared map
    for both bucket pair kernels, so the supported-id contract cannot
    drift between them."""
    import numpy as np
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return {
        LongType(): ("bigint", np.int64),
        IntegerType(): ("int", np.int32),
        ShortType(): ("smallint", np.int16),
        ByteType(): ("tinyint", np.int8),
    }


def _sequential_pair_scores(U, ia, ib):
    """Dot products for the index pairs (ia, ib) over row matrix U,
    accumulated DIMENSION-SEQUENTIALLY with preallocated out= buffers
    — the exact multiply-then-add IEEE sequence of the interpreted
    fold.  ONE shared kernel for both bucket pair generators: the
    bit-identity-with-the-fold contract lives here, so a future
    accumulation change cannot silently diverge the two."""
    import numpy as np

    npairs = len(ia)
    acc = np.zeros(npairs)
    ga = np.empty(npairs)
    gb = np.empty(npairs)
    tmp = np.empty(npairs)
    for i in range(U.shape[1]):
        np.take(U[:, i], ia, out=ga)
        np.take(U[:, i], ib, out=gb)
        np.multiply(ga, gb, out=tmp)
        np.add(acc, tmp, out=acc)
    return acc


def bucket_cosine_pairs_vectorized(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_bucket: int | None = None,
) -> DataFrame:
    """Within-bucket pair generation + cosine-threshold filter as ONE
    Arrow-batched numpy kernel per bucket — the vectorized twin of
    ``bucket_pairs(...).filter(dot(a, b) >= t)`` over UNIT vectors.

    Bit-identical to the interpreted fold (asserted in tests): the
    accumulation loops over dimensions in sequence
    (``acc = acc + A[:, i] * B[:, i]``), so every pair's dot product
    performs the exact multiply/add sequence of the left fold in
    IEEE binary64 — same doubles, same threshold decisions — while
    vectorizing ACROSS pairs at numpy rates (measured 2.2s -> 0.6s on
    251k candidate pairs at sf0.1).

    Scale shape: Arrow transfers O(bucket members) rows; the
    quadratic pair mass materializes only inside the kernel as the
    two int index arrays plus four preallocated f64 pair-length
    buffers (gather a/b, product, accumulator) reused across the
    dimension loop — ~6 pair-length arrays total, ~400 MB peak at the
    4096-member cap, bounded and allocation-stable (naive per-step
    temporaries would double that and churn the allocator).  Buckets
    past ``max_bucket`` are dropped whole — the identical
    degenerate-quantizer guard as ``bucket_pairs``.

    Output: ``(id_a, id_b)`` with ``id_a < id_b``, typed as the input
    id column (integral ids only — the kernel sorts/gathers them as a
    numpy integer array; a non-integral id fails HERE at planning with
    the real cause, not inside an executor-side Arrow kernel).
    """
    id_type = df.schema[id_col].dataType
    if id_type not in _integral_id_types():
        raise TypeError(
            f"bucket_cosine_pairs_vectorized needs an integral id "
            f"column; {id_col} is {id_type.simpleString()}"
        )
    sql_t, np_t = _integral_id_types()[id_type]

    def gen(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np_t),
                "id_b": np.array([], dtype=np_t),
            }
        )
        n = len(pdf)
        if n < 2 or (max_bucket is not None and n > max_bucket):
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        U = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        # sorted ids + upper-triangle indices => id_a < id_b for free
        ia, ib = np.triu_indices(n, k=1)
        acc = _sequential_pair_scores(U, ia, ib)
        m = acc >= threshold
        return pd.DataFrame({"id_a": ids[ia[m]], "id_b": ids[ib[m]]})

    return (
        df.select(bucket_col, id_col, vec_col)
        .groupBy(bucket_col)
        .applyInPandas(gen, f"id_a {sql_t}, id_b {sql_t}")
    )


def bucket_cosine_pairs_vs_index_vectorized(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    vec_col: str,
    new_col: str,
    threshold: float,
    max_bucket: int | None = None,
) -> DataFrame:
    """Within-bucket cosine-threshold pairs INVOLVING AT LEAST ONE NEW
    row — the incremental twin of
    :func:`bucket_cosine_pairs_vectorized` for the batch-vs-stored-
    index lifecycle: stored members pair only against the batch, never
    against each other (their pairs were computed and persisted at
    index-build time), so per-bucket score work is
    O((|new| x |old| + |new|^2/2) x d), tracking the BATCH, never the
    history — the same work contract as
    ``dedup.minhash_lsh_candidates_vs_index``.

    ``new_col`` is a boolean column marking batch rows.  Pair index
    arrays are built directly as (new x old) + triu(new) — memory
    tracks emitted candidates, not the full in-bucket triangle — and
    the dimension loop is the identical sequential multiply-then-add
    sequence as the self-dedup kernel, so scores are bit-equal to the
    interpreted fold (same doubles, same threshold decisions).
    ``max_bucket`` caps the TOTAL (old + new) bucket size, dropped
    whole — the same degenerate-quantizer guard.

    Output: ``(id_a, id_b)`` with ``id_a < id_b``, typed as the input
    id column (integral ids only, checked at planning).  A batch row
    REUSING a stored id (at-least-once redelivery of an already-
    indexed vector) pairs with everything EXCEPT its own stored twin
    — the ``ids differ`` guard below — so no self-loop edge ever
    reaches the component step; collapsing such redeliveries is the
    caller's contract (see :func:`plans.similarity_queries.
    semantic_dedup_vs_index`).
    """
    id_type = df.schema[id_col].dataType
    if id_type not in _integral_id_types():
        raise TypeError(
            f"bucket_cosine_pairs_vs_index_vectorized needs an integral "
            f"id column; {id_col} is {id_type.simpleString()}"
        )
    sql_t, np_t = _integral_id_types()[id_type]

    def gen(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np_t),
                "id_b": np.array([], dtype=np_t),
            }
        )
        n = len(pdf)
        if n < 2 or (max_bucket is not None and n > max_bucket):
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        U = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        is_new = pdf[new_col].to_numpy()[order].astype(bool)
        idx_new = np.flatnonzero(is_new)
        idx_old = np.flatnonzero(~is_new)
        parts_a, parts_b = [], []
        if len(idx_new) and len(idx_old):
            a = np.repeat(idx_new, len(idx_old))
            b = np.tile(idx_old, len(idx_new))
            parts_a.append(np.minimum(a, b))
            parts_b.append(np.maximum(a, b))
        if len(idx_new) >= 2:
            ta, tb = np.triu_indices(len(idx_new), k=1)
            parts_a.append(idx_new[ta])
            parts_b.append(idx_new[tb])
        if not parts_a:
            return empty
        ia = np.concatenate(parts_a)
        ib = np.concatenate(parts_b)
        # shared bit-identity scoring kernel (same IEEE sequence as
        # the self-dedup generator and the interpreted fold)
        acc = _sequential_pair_scores(U, ia, ib)
        # drop self-pairs: a redelivered batch row shares its id with
        # its stored twin; pairing them would emit id_a == id_b
        m = (acc >= threshold) & (ids[ia] != ids[ib])
        # ids sorted ascending => index order == id order => id_a < id_b
        return pd.DataFrame({"id_a": ids[ia[m]], "id_b": ids[ib[m]]})

    return (
        df.select(bucket_col, id_col, vec_col, new_col)
        .groupBy(bucket_col)
        .applyInPandas(gen, f"id_a {sql_t}, id_b {sql_t}")
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched numpy matmul — the
    vectorized twin of :func:`brute_force_topk`.

    The JVM higher-order-function fold is oracle-reproducible but runs
    interpreted (~100x slower per FLOP than BLAS); at real corpus
    sizes the matmul path wins.  Distribution pattern:

    1. collect the (small by contract) query matrix to the driver and
       close over it (broadcast via task serialization);
    2. per Arrow batch: one ``C @ Q.T`` and an ``argpartition`` keeps
       only the batch-local top-k per query — each partition emits at
       most k rows per query, so the shuffle carries
       O(k x partitions x queries), never O(|corpus| x |queries|);
    3. a final ranking window merges the partition winners.

    Scores are float64 matmul results (pairwise summation), so they
    can differ from the sequential fold in the last ulp — rows-only
    driver check; the unit test asserts the neighbor SETS match the
    fold path.
    """
    import numpy as np

    q_rows = _collect_bounded(
        queries.select(id_col, vec_col), max_queries,
        "brute_force_topk_vectorized query set",
    )
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Cn @ Qn.T                      # (n_batch, n_queries)
            sims[ids[:, None] == qids[None, :]] = -np.inf  # self-match
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, m)
            out_q = np.repeat(qids, kk)
            out_n = ids[top.T.ravel()]
            out_s = np.take_along_axis(sims, top, axis=0).T.ravel()
            keep = out_s > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": out_q[keep],
                    "neighbor_id": out_n[keep],
                    "cosine_sim": out_s[keep],
                }
            )

    from pyspark.sql import Window

    candidates = spread(corpus).mapInPandas(
        local_topk, "query_id long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        candidates.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _lloyd(X, k: int, iters: int):
    """Deterministic Lloyd's k-means in float64 numpy: init = first k
    rows, fixed iteration count, empty clusters keep their previous
    centroid, no RNG anywhere — so centroids are bit-stable across
    runs.  Returns the (k, d) centroid matrix."""
    C = X[:k].copy()
    for _ in range(iters):
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    return C


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """TRAINED coarse quantizer for cosine-metric IVF: spherical
    k-means (Lloyd's on L2-normalized sample vectors, centroids
    re-normalized each round) over a bounded deterministic sample —
    the first ``_PQ_TRAIN_SAMPLE`` vectors by id, the same sampling
    convention :func:`_pq_codebooks` uses.  Untrained first-N
    centroids give skewed inverted lists on clustered data (uneven
    task sizes at 100 TB); training costs one bounded collect plus
    driver-side numpy and balances the lists.  Assignment downstream
    ranks by raw dot product, which for unit centroids is |v|·cos —
    the argmax over centroids equals the cosine argmax."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("i"),
                      _to_double(F.col(vec_col)).alias("v"))
        .orderBy("i")
        .limit(_PQ_TRAIN_SAMPLE)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    # A NaN/Inf sample vector would propagate through every mean into
    # every centroid (and then fail literal folding downstream with a
    # parse error); drop corrupt rows from the TRAINING sample only —
    # assignment still sees every corpus row.
    if len(X):
        X = X[np.isfinite(X).all(axis=1)]
    if len(X) < n_centroids:
        raise ValueError(
            f"corpus smaller than n_centroids={n_centroids} "
            "(after dropping non-finite sample vectors)"
        )
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    C = X[:n_centroids].copy()
    for _ in range(_PQ_KMEANS_ITERS):
        assign = (X @ C.T).argmax(axis=1)      # cosine on unit vectors
        for c in range(n_centroids):
            mask = assign == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    return [list(map(float, C[c])) for c in range(n_centroids)]


def _cents_array_sql(cents) -> str:
    """The trained quantizer folded in as ONE parsed SQL expression,
    not a Column-API tree: building n_centroids separate dot-fold
    trees via py4j costs one JVM round-trip per literal (n_centroids x
    dim floats, ~2s of DRIVER time per call at 16x64 — flat across
    every data scale, measured via the cross-SF sweep), while one
    expr() string is a single parse.  repr(float) is the shortest
    round-trip form, so the 'D' literals decode to bit-identical
    doubles and the fold matches dot() exactly (asserted: output
    identical to the Column-API formulation)."""
    return "array(" + ",".join(
        "array(" + _sql_double_literals(c) + ")" for c in cents
    ) + ")"


def _ranked_cells_sql(cents_sql: str, vec_col: str, n: int) -> str:
    """Best-first (negdot, cid) list for the let-bound vector `t`,
    truncated to the top n — struct sort is lexicographic, so ties
    break on centroid id.  The input vector is bound as a lambda
    variable (1-element-array transform) so the cast runs once per
    row, and every centroid scores inside ONE transform lambda."""
    vd = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    return (
        f"transform(array({vd}), t -> slice(array_sort("
        f"transform({cents_sql}, (c, i) -> named_struct("
        "'negdot', -aggregate(zip_with(t, c, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x), "
        f"'cid', CAST(i AS INT)))), 1, {n}))[0]"
    )


def _assign_postings(
    corpus: DataFrame, cents, id_col: str, vec_col: str
) -> DataFrame:
    """Every corpus vector with its inverted-list cell: ``(id_col,
    _cid int, _cv array<double>, _cn double)`` — ONE narrow pass
    against folded centroid literals, no shuffle.  Side norms
    materialized once per row (not per candidate pair): same bit-exact
    float tree as cosine(), 1/3 the interpreted fold work on the
    |list| x |probe| candidate set — see brute_force_topk."""
    cents_sql = _cents_array_sql(cents)
    return spread(corpus).select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("_cv"),
        F.expr(_ranked_cells_sql(cents_sql, vec_col, 1))[0]["cid"].alias(
            "_cid"
        ),
    ).withColumn("_cn", norm(F.col("_cv")))


def _ivf_search(
    cents,
    postings: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    max_queries: int,
    prune_cells: bool = False,
) -> DataFrame:
    """Shared IVF search core: queries probe their ``nprobe`` nearest
    cells (folded centroid literals), candidates come from an equi-join
    on ``_cid`` against the postings relation, exact cosine only on
    candidates, per-query top-k window.  Used by both the
    train-and-search path (:func:`ivf_topk`) and the stored-index path
    (:func:`ivf_topk_vs_index`).

    ``prune_cells`` pushes a STATIC ``_cid IN (probed cells)`` filter
    onto the postings side, computed with one extra small job over the
    (bounded by contract) query set: against ``partitionBy("_cid")``
    parquet this is guaranteed PARTITION PRUNING at the scan — the IVF
    candidate reduction becomes an I/O reduction without relying on
    dynamic partition pruning to fire (plan-pinned in
    tests/test_similarity.py).  The prune set is collected in a
    separate job from the main action, so the (bounded-by-contract)
    queries relation is PINNED first with an eager ``localCheckpoint``
    — both jobs then read the same materialized rows, and a
    nondeterministic queries source (``rand()``/unordered ``limit``/
    mutating feed) cannot probe a cell the prune filter removed.  The
    ONE probe-cells expression string is additionally shared between
    the prune collect and the main plan's probes, so the cover
    property cannot drift between the two."""
    from pyspark.sql import Window

    if not 0 < nprobe <= len(cents):
        raise ValueError("nprobe must be in (0, n_centroids]")
    _require_small(queries, max_queries, "IVF search query set")
    if prune_cells:
        # pin BEFORE the prune collect: the queries relation is read by
        # two jobs (prune set + main action) and must not re-evaluate
        queries = queries.localCheckpoint(eager=True)
    cents_sql = _cents_array_sql(cents)
    probe_cells_sql = (
        f"transform({_ranked_cells_sql(cents_sql, vec_col, nprobe)},"
        " s -> s.cid)"
    )
    if prune_cells:
        cell_rows = (
            queries.select(
                F.explode(F.expr(probe_cells_sql)).alias("_cid")
            )
            .distinct()
            .collect()                       # <= n_centroids rows
        )
        postings = postings.filter(
            F.col("_cid").isin([r["_cid"] for r in cell_rows])
        )
    assigned = postings.select(
        F.col(id_col).alias("neighbor_id"), "_cv", "_cid", "_cn"
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qv"),
        F.explode(F.expr(probe_cells_sql)).alias("_cid"),
    ).withColumn("_qn", norm(F.col("_qv")))
    scored = (
        assigned.join(F.broadcast(probes), on="_cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("_qv"), F.col("_cv"))
             / (F.col("_qn") * F.col("_cn"))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The standard two-level ANN layout: a coarse quantizer TRAINED with
    spherical k-means on a bounded deterministic sample
    (:func:`ivf_centroids` — n_centroids * dim floats, tiny by design,
    exactly how FAISS-style IVF trains on a sample), every corpus
    vector is assigned to its nearest centroid in ONE narrow pass
    against folded centroid literals, and each query probes only the
    ``nprobe`` nearest inverted lists.  Work drops from
    |corpus| x |queries| to ~(nprobe / n_centroids) of it; recall < 1
    by construction, so the registry query wraps this in a recall
    self-check (see plans/similarity_queries.py).

    This is the train-per-run convenience path; at 100 TB the index is
    built ONCE (:func:`ivf_build_index`), persisted, and every later
    batch searches the stored relation (:func:`ivf_topk_vs_index`).

    Output: (query_id, neighbor_id, cosine_sim, rnk).
    """
    if not 0 < n_centroids <= MAX_CENTROIDS:
        raise ValueError(
            f"n_centroids must be in (0, {MAX_CENTROIDS}]: the coarse "
            f"quantizer is collected driver-side and folded into the plan"
        )
    if not 0 < nprobe <= n_centroids:   # fail BEFORE paying training
        raise ValueError("nprobe must be in (0, n_centroids]")
    # bounded-side contract BEFORE training too: an oversized query
    # set should fail fast, not after paying the quantizer collect
    # (the cheap limit(max+1) probe re-runs inside _ivf_search — one
    # trivial extra job, kept for the vs-index path's independence)
    _require_small(queries, max_queries, "ivf_topk query set")
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    postings = _assign_postings(corpus, cents, id_col, vec_col)
    return _ivf_search(
        cents, postings, queries, k, nprobe, id_col, vec_col, max_queries
    )


def ivf_build_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE IVF index of a corpus — the embedding
    twin of ``operators/dedup.py::minhash_band_index``: train once,
    store, and every future batch searches the stored relations
    instead of re-training and re-scanning history.

    Returns ``(centroids, postings)``:

    * ``centroids`` — ``(cid int, cu array<double>)``, the trained
      spherical-k-means quantizer (k rows, tiny);
    * ``postings`` — ``(id_col, _cid int, _cv array<double>,
      _cn double)``, every corpus vector with its inverted-list cell
      and precomputed norm.

    Persistence contract: write both to parquet — postings
    ``partitionBy("_cid")`` so a search's ``nprobe`` cell probes prune
    to nprobe/k of the files at the SCAN (partition pruning turns the
    IVF candidate reduction into an I/O reduction, which is the whole
    point at 100 TB); reload with ``spark.read.parquet`` and hand both
    to :func:`ivf_topk_vs_index`.  Round-trip equality is pinned in
    tests/test_similarity.py.
    """
    if not 0 < n_centroids <= MAX_CENTROIDS:
        raise ValueError(
            f"n_centroids must be in (0, {MAX_CENTROIDS}]: the coarse "
            f"quantizer is collected driver-side and folded into the plan"
        )
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    centroids = corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cid int, cu array<double>",
    )
    return centroids, _assign_postings(corpus, cents, id_col, vec_col)


def ivf_topk_vs_index(
    centroids,
    postings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
    prune_cells: bool = True,
) -> DataFrame:
    """ANN search of a query batch against a STORED IVF index
    (:func:`ivf_build_index`, typically reloaded from parquet) — the
    daily-batch lifecycle at 100 TB: no re-training, no corpus
    re-assignment; driver-side work is collecting the k-row centroid
    table (bounded by contract) to fold the probe expression plus one
    small job computing the probed cell set, which is pushed as a
    STATIC partition filter — postings ``partitionBy("_cid")`` then
    GUARANTEES the scan reads only the probed cells' files
    (plan-pinned), not merely hopes dynamic pruning fires.  Pass
    ``prune_cells=False`` when the postings relation is NOT a file
    scan (checkpointed/derived — nothing to prune; the extra prune job
    and the query-pinning checkpoint are pure overhead).  Pruning is
    safe even for nondeterministic query relations: the query set is
    pinned with an eager ``localCheckpoint`` before the prune set is
    collected (see :func:`_ivf_search`).

    Output: (query_id, neighbor_id, cosine_sim, rnk) — identical
    contract to :func:`ivf_topk`; searching an index built from the
    same corpus returns the identical result (pinned in tests).
    """
    cents = _stored_centroids(centroids, "ivf_topk_vs_index")
    _require_dim(
        queries, vec_col, len(cents[0]), "ivf_topk_vs_index queries"
    )
    return _ivf_search(
        cents, postings, queries, k, nprobe, id_col, vec_col, max_queries,
        prune_cells=prune_cells,
    )


def _stored_centroids(centroids, what: str) -> list[list[float]]:
    """Collect + validate a stored centroid table (bounded by
    contract): dense cids 0..k-1, because the folded probe expression
    indexes cells by position.

    Accepts either the centroid DataFrame or an already-collected
    centroid list from a previous call (r15, guide §5: callers driving
    several appends/searches against ONE stored index were paying a
    driver collect job per operator call — collect once, thread the
    list through)."""
    if isinstance(centroids, list):
        return centroids
    rows = _collect_bounded(
        centroids.select("cid", "cu").orderBy("cid"),
        MAX_CENTROIDS,
        f"{what} centroid table",
    )
    if not rows:
        raise ValueError("empty centroid table: build the index first")
    if [r["cid"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            "centroid table must carry dense cids 0..k-1 (the probe "
            "expression indexes cells by position); rebuild via "
            "ivf_build_index"
        )
    return [list(map(float, r["cu"])) for r in rows]


def _require_dim(df: DataFrame, vec_col: str, expected: int, what: str) -> None:
    """Assert a vector column's width matches a stored index's trained
    dimension — ONE 1-row probe (empty frames pass vacuously).  Without
    this, ``zip_with`` against folded centroid literals NULL-PADS a
    mismatched vector and silently mis-assigns every row (confirmed:
    a wrong-dim batch all lands in cell 0), persisting a corrupt index
    instead of failing the ingest with the real cause."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is not None and row["d"] != expected:
        raise ValueError(
            f"{what}: vector dimension {row['d']} does not match the "
            f"stored index's trained dimension {expected} — the batch/"
            f"query feed and the index were built from different "
            f"embedding spaces; rebuild the index or fix the feed"
        )


def _enforce_dim(df: DataFrame, vec_col: str, expected: int,
                 what: str) -> DataFrame:
    """EXECUTOR-SIDE dimension guard for the WRITE paths
    (:func:`ivf_index_append`, :func:`pq_index_append`): a
    null-on-success ``assert_true`` is folded into the vector column
    itself — the ``when`` condition evaluates the assertion per row,
    so it cannot be pruned away and a MIXED-width batch (first row
    correct, later rows wrong — invisible to the 1-row
    :func:`_require_dim` probe) fails the ingest job with the real
    cause instead of silently persisting mis-assigned rows via
    ``zip_with`` null-padding."""
    # coalesce BOTH the condition and the message's size operand: for
    # a NULL vector F.size is NULL, which would (a) null the condition
    # so assert_true fires, but (b) null the concat'd message too — the
    # job would fail WITHOUT the promised real-cause diagnostic
    sz = F.coalesce(F.size(F.col(vec_col)), F.lit(-1))
    ok = F.assert_true(
        sz == expected,
        F.concat(
            F.lit(f"{what}: vector dimension "),
            sz.cast("string"),
            F.lit(
                f" does not match the stored index's trained dimension "
                f"{expected} — mixed-width batch; fix the feed"
                " (dimension -1 = NULL vector)"
            ),
        ),
    )
    return df.withColumn(
        vec_col, F.when(ok.isNull(), F.col(vec_col))
    )


def ivf_index_append(
    centroids,
    postings: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The WRITE path of the persisted-index lifecycle: assign a new
    ingest batch to the STORED centroids and return the grown postings
    relation — ``ivf_build_index`` once, then per daily batch
    ``ivf_index_append`` + overwrite-or-append of the touched ``_cid``
    partitions; no retraining, no history rescan.  Work is
    O(|batch| x k x d) narrow compute on the batch side plus the union
    (which at the storage layer is an append into the ``_cid``
    partition directories — history is never rewritten).

    Equality contract (pinned in tests): appended postings equal the
    assignment of the UNION corpus under the same stored centroids, so
    ``ivf_topk_vs_index`` over the grown index is exactly the search a
    from-scratch assignment (same quantizer) would serve.  Batch ids
    must be disjoint from stored ids — a redelivered already-indexed
    vector should be collapsed upstream (the CDC dedup-latest path owns
    at-least-once absorption), exactly the
    ``semantic_dedup_vs_index`` contract.

    Centroid DRIFT is the operator's documented limit, same as every
    static-quantizer ANN index (FAISS IVF included): appended batches
    from a shifted distribution degrade cell balance, not correctness
    (recall contracts live in the graded queries).  Monitor cell
    occupancy skew over the grown postings (:func:`ivf_cell_stats`)
    and rebuild via ``ivf_build_index`` when it drifts — rebuild cost
    amortizes across the batches served in between.

    Output: the grown postings ``(id_col, _cv, _cid, _cn)``,
    column-aligned with the stored relation.
    """
    cents = _stored_centroids(centroids, "ivf_index_append")
    _require_dim(batch, vec_col, len(cents[0]), "ivf_index_append batch")
    # executor-side guard: a MIXED-width batch must fail the job, not
    # persist rows mis-assigned to cell 0 via zip_with null-padding
    batch = _enforce_dim(
        batch, vec_col, len(cents[0]), "ivf_index_append batch"
    )
    new_postings = _assign_postings(batch, cents, id_col, vec_col)
    return postings.select(id_col, "_cv", "_cid", "_cn").unionByName(
        new_postings.select(id_col, "_cv", "_cid", "_cn")
    )


def ivf_cell_stats(
    postings: DataFrame, n_centroids: int | None = None
) -> DataFrame:
    """Per-cell occupancy diagnostics over a stored IVF postings
    relation — the REBUILD TRIGGER the append path's drift contract
    points at (:func:`ivf_index_append`): appended batches from a
    shifted distribution degrade cell balance long before they hurt
    recall, and balance is what sizes the probe-side tasks at 100 TB.

    Output: ``(cid, n, frac, skew)`` — ``frac`` = cell share of the
    corpus, ``skew`` = n / (total / k), so a healthy index reads ~1.0
    everywhere and a drifted one shows hot cells >> 1.  ``n_centroids``
    fixes k when trailing cells may be EMPTY (empty cells vanish from
    a groupBy; passing the trained k keeps the mean honest); defaults
    to the number of occupied cells.

    Plan shape: one groupBy (k rows out) + a window total over those
    k rows — the SinglePartition stage sits over <= MAX_CENTROIDS
    rows, the same bounded-aggregate pattern the sketch operators use.

    ``n_centroids`` is validated: <= 0 fails at planning, and a value
    BELOW the occupied-cell count fails at execution (assert_true over
    the same window) — a stale trained k would otherwise deflate every
    skew reading and the rebuild trigger would never fire.
    """
    from pyspark.sql import Window

    if n_centroids is not None and n_centroids <= 0:
        raise ValueError(
            f"ivf_cell_stats: n_centroids must be positive, got "
            f"{n_centroids} (a k of 0 reads every skew as 0 and the "
            "drift monitor never fires)"
        )
    counts = postings.groupBy("_cid").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    occupied = F.count("*").over(w)
    if n_centroids is not None:
        k = F.lit(n_centroids)
        # k below the occupied-cell count means the caller passed the
        # trained k of an OLDER build — every skew would read low and
        # the monitor would report a drifted index as healthy; the
        # coalesce folds the (null-on-success) assertion into the
        # skew expression so it cannot be pruned away
        guard = F.assert_true(
            k >= occupied,
            F.concat(
                F.lit("ivf_cell_stats: n_centroids below the occupied-"
                      "cell count ("),
                occupied.cast("string"),
                F.lit(") — stale trained k deflates skew"),
            ),
        ).cast("double")
    else:
        k = occupied
        guard = F.lit(None).cast("double")
    return counts.select(
        F.col("_cid").alias("cid"),
        "n",
        (F.col("n") / total).alias("frac"),
        (F.col("n") * k / total + F.coalesce(guard, F.lit(0.0))).alias(
            "skew"
        ),
    )


def _hyperplane_values(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, computed driver-side
    once so each plane becomes a single folded array literal in the
    plan.  (An earlier version derived components from
    ``xxhash64(lit)`` expressions per row — never constant-folded,
    ~1000 interpreted hash evals per row, 20x slower, measured.)"""
    import random

    rng = random.Random(0x51_6E_AD)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 32
) -> Column:
    """r-bit sign signature of a vector under n_planes hyperplanes.

    The plane matrix is folded in as ONE parsed SQL literal (a
    ``F.lit`` per component costs a py4j round-trip each — n_planes x
    dim of them was ~2s of flat driver time per plan, same disease
    the IVF quantizer had); the per-plane sign bits then compute in
    one ``transform`` + OR-``aggregate`` over the let-bound input
    vector.  Bit-identical to the explicit bitwiseOR chain (OR is
    commutative; the dot fold is unchanged)."""
    planes = _hyperplane_values(dim, n_planes)
    # Bit weights as shiftleft expressions, not numeric literals: the
    # i=63 weight (2^63) overflows the bigint literal range and would
    # fail to PARSE for n_planes=64, while shiftleft(1L, 63) constant-
    # folds to the correct sign-bit long.
    planes_col = F.expr(
        "array(" + ",".join(
            f"named_struct('w', shiftleft(1L, {i}), 'p', array("
            + _sql_double_literals(p)
            + "))"
            for i, p in enumerate(planes)
        ) + ")"
    )

    def _sig(t: Column) -> Column:
        bits = F.transform(
            planes_col,
            lambda s: F.when(dot(t, s["p"]) > 0, s["w"]).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.aggregate(
            bits,
            F.lit(0).cast("long"),
            lambda acc, b: acc.bitwiseOR(b),
        )

    return F.transform(F.array(_to_double(vec)), _sig)[0]


def lsh_bucketed_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    n_bands: int = 4,
    min_cosine: float = 0.0,
) -> DataFrame:
    """Candidate near-neighbor pairs via hyperplane-LSH band blocking.

    Signatures are computed once; candidate id pairs come from
    per-(band, band_bits) buckets (``bucket_pairs`` — no self-join, so
    the signature expression isn't evaluated once per join side), are
    deduped across bands, and only then are the vectors joined back for
    the exact cosine.  Carrying ids (8 bytes) instead of vectors
    through the bucket shuffle keeps the wide rows out of the skewed
    stage.  Output: (id_a, id_b, cosine_sim).
    """
    from .dedup import bucket_pairs

    width = n_planes // n_bands
    base = spread(df).select(
        F.col(id_col).alias("_id"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("_sig"),
    )
    banded = base.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_sig", i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_band", "_bv"),
    )
    candidates = (
        bucket_pairs(banded, ["_band", "_bv"], F.col("_id"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .distinct()
    )
    # Norm materialized once per vector row (evaluated before the
    # joins), not per candidate pair — bit-equal, 1/3 the fold work.
    vecs = df.select(
        F.col(id_col).alias("_vid"), _to_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    return (
        candidates.join(vecs, candidates.id_a == vecs._vid)
        .withColumnRenamed("_v", "_va")
        .withColumnRenamed("_n", "_na")
        .drop("_vid")
        .join(vecs, candidates.id_b == vecs._vid)
        .withColumnRenamed("_v", "_vb")
        .withColumnRenamed("_n", "_nb")
        .drop("_vid")
        .select(
            "id_a",
            "id_b",
            (dot(F.col("_va"), F.col("_vb"))
             / (F.col("_na") * F.col("_nb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column.

    Output: ``(id, _scale double, _norm double, _qv array<tinyint>)``
    with ``q_i = round(v_i / scale)``, ``scale = max|v| / 127``.

    The 100 TB rationale: a float32 corpus re-encoded int8 scans 4x
    fewer bytes and dot products run on integers; the true vector
    norm is captured AT QUANTIZATION TIME so approximate cosine
    needs only the quantized codes downstream (the standard
    scalar-quantization layout, cf. FAISS SQ8).  All JVM-side
    higher-order functions — no UDF, no shuffle.
    """
    v = _to_double(F.col(vec_col))
    with_scale = df.select(
        F.col(id_col),
        v.alias("_v"),
        (
            F.greatest(
                F.array_max(F.transform(v, F.abs)), F.lit(1e-30)
            )
            / F.lit(127.0)
        ).alias("_scale"),
        norm(v).alias("_norm"),
    )
    return with_scale.select(
        id_col,
        "_scale",
        "_norm",
        F.transform(
            F.col("_v"),
            lambda x: F.round(x / F.col("_scale")).cast("tinyint"),
        ).alias("_qv"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate top-k cosine over int8-quantized codes.

    Same dataflow as ``brute_force_topk`` (broadcast queries, corpus
    stays partitioned, per-query ranking window) but the pair math is
    an integer dot product over the codes:
    ``cos ~= (scale_a * scale_b * dot(qa, qb)) / (norm_a * norm_b)``.
    Quantization error is bounded by ``scale/2`` per component, so
    recall@k degrades gracefully (property-tested >= 0.8 vs exact).
    """
    from pyspark.sql import Window

    _require_small(queries, max_queries, "quantized_topk query set")
    # Codes are STORED int8; widen to long once per row BELOW the join
    # so the per-pair fold runs cast-free (byte*byte would overflow,
    # and per-element casts per pair cost ~3x the multiply itself).
    widen = lambda col: F.transform(col, lambda x: x.cast("long"))  # noqa: E731
    c = quantize_vectors(spread(corpus), id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_scale").alias("_cs"),
        F.col("_norm").alias("_cn"),
        widen(F.col("_qv")).alias("_cq"),
    )
    q = quantize_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_scale").alias("_qs"),
        F.col("_norm").alias("_qn"),
        widen(F.col("_qv")).alias("_qq"),
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("_cq"), F.col("_qq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("_cs")
                * F.col("_qs")
                * int_dot.cast("double")
                / (F.col("_cn") * F.col("_qn"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# -- product quantization (PQ / ADC) ---------------------------------

_PQ_TRAIN_SAMPLE = 1024
_PQ_KMEANS_ITERS = 10


def _pq_codebooks(
    corpus: DataFrame,
    m: int,
    ksub: int,
    id_col: str,
    vec_col: str,
):
    """Deterministic PQ codebooks via driver-side Lloyd's iterations.

    FAISS trains PQ codebooks with k-means on a sample; we do exactly
    that, deterministically: the sample is the first
    ``_PQ_TRAIN_SAMPLE`` vectors by id (bounded collect, same
    convention as :func:`ivf_topk`), initialization is the first
    ``ksub`` subvectors, and ``_PQ_KMEANS_ITERS`` fixed Lloyd's
    rounds run in float64 numpy (no RNG anywhere, so codebooks are
    bit-stable across runs).  An emptied cluster keeps its previous
    centroid.  Returns ``(codebooks[m][ksub][dsub], dim)``."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("i"),
                      _to_double(F.col(vec_col)).alias("v"))
        .orderBy("i")
        .limit(_PQ_TRAIN_SAMPLE)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    # Same corrupt-sample guard as ivf_centroids: one NaN vector in
    # the sample would poison every codebook centroid.
    if len(X):
        X = X[np.isfinite(X).all(axis=1)]
    if len(X) < ksub:
        raise ValueError(
            f"corpus smaller than ksub={ksub} "
            "(after dropping non-finite sample vectors)"
        )
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        C = _lloyd(X[:, j * dsub:(j + 1) * dsub], ksub, _PQ_KMEANS_ITERS)
        books.append([list(map(float, C[c])) for c in range(ksub)])
    return books, dim


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantize an embedding column: dim/m-dim subvectors each
    mapped to their nearest (L2) codebook centroid.

    Output: ``(id, _codes array<int> length m, _norm double)`` — a
    64-dim float32 vector compresses to m bytes of codes (here 8,
    a 32x reduction) plus the true norm captured at encode time, the
    same layout trick as :func:`quantize_vectors`.  Encoding is a
    narrow map over folded centroid literals (one pass, no shuffle,
    no UDF); ties pick the smallest code (``array_position`` returns
    the first minimum).
    """
    books, dim = _pq_codebooks(corpus, m, ksub, id_col, vec_col)
    dsub = dim // m
    v = _to_double(F.col(vec_col))

    def code_for(j: int):
        sub = F.slice(v, j * dsub + 1, dsub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(x) for x in books[j][c]]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in range(ksub)
            ]
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return corpus.select(
        F.col(id_col),
        F.array(*[code_for(j) for j in range(m)]).alias("_codes"),
        norm(v).alias("_norm"),
    )


def pq_encode_vectorized(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books=None,
) -> DataFrame:
    """Arrow/numpy twin of :func:`pq_encode` — same output contract,
    batch argmin instead of m*ksub interpreted fold expressions per
    row (the JVM expression tree is ~20x slower at ksub=64, measured
    at sf0.1).  Ties pick the smallest code (numpy argmin returns the
    first minimum, matching ``array_position``'s first-match)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    if books is None:
        books, _ = _pq_codebooks(corpus, m, ksub, id_col, vec_col)
    C = [np.asarray(b, dtype=np.float64) for b in books]  # m x (ksub, dsub)
    dsub = C[0].shape[1]
    id_type = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type, False),
            StructField("_codes", ArrayType(IntegerType(), False), False),
            StructField("_norm", DoubleType(), False),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(pdf), len(C)), dtype=np.int32)
            for j, Cj in enumerate(C):
                S = X[:, j * dsub:(j + 1) * dsub]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ Cj.T)
                    + (Cj * Cj).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_codes": list(codes.tolist()),
                    "_norm": np.linalg.norm(X, axis=1),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 64,
    rerank: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate top-k cosine via PQ asymmetric distance computation
    (ADC): per query, precompute the m x ksub table of
    ``dot(q_sub_j, centroid_{j,c})`` driver-side; a corpus row's
    approximate dot product is then m TABLE LOOKUPS (one per stored
    code) instead of dim multiplies — the classic IVFADC inner loop,
    here as a JVM fold over a broadcast literal table.

    approx_cos = sum_j table[j][code_j] / (|q| * |v|)  (true norms).

    ``rerank`` applies the standard IVFADC refinement: ADC keeps a
    ``rerank * k`` shortlist per query, true vectors are joined back
    for exact cosine on the shortlist only, and the final top-k ranks
    exact scores.  Total exact-FLOP work per query is ``rerank * k``
    vectors instead of the whole corpus; ``rerank=0`` returns raw ADC
    scores.  (On low-structure data PQ codes alone recall ~0.5@5;
    with the shortlist rerank the property test holds >= 0.8.)

    Same dataflow contract as the rest of the family: queries
    bounded + broadcast, corpus stays partitioned, per-query top-k
    window.  Recall < 1 by construction -> rows-only driver check;
    recall@k vs the exact fold is property-tested.
    """
    books, _dim = _pq_codebooks(corpus, m, ksub, id_col, vec_col)
    # vectorized encode is the scale path (identical contract; the
    # JVM-fold pq_encode stays for zero-Python deployments)
    enc = pq_encode_vectorized(
        spread(corpus), m, ksub, id_col, vec_col, books=books
    ).select(F.col(id_col).alias("neighbor_id"), "_codes", "_norm")
    return _pq_search(
        books, enc, corpus, queries, k, m, ksub, rerank, id_col, vec_col,
        max_queries,
    )


def _pq_search(
    books,
    codes: DataFrame,
    rerank_corpus: DataFrame,
    queries: DataFrame,
    k: int,
    m: int,
    ksub: int,
    rerank: int,
    id_col: str,
    vec_col: str,
    max_queries: int,
) -> DataFrame:
    """Shared PQ/ADC search core: per-query lookup tables built
    driver-side from ``books``, ADC scoring over the ``codes``
    relation (``(neighbor_id, _codes, _norm)``), optional exact
    rerank joining true vectors from ``rerank_corpus``.  Used by both
    the train-per-run path (:func:`pq_topk`) and the stored-index
    path (:func:`pq_topk_vs_index`)."""
    from pyspark.sql import Window

    dsub = len(books[0][0])
    dim = m * dsub
    q_rows = _collect_bounded(
        queries.select(id_col, vec_col), max_queries, "pq search query set"
    )
    spark = queries.sparkSession
    tbl_rows = []
    for r in q_rows:
        qv = [float(x) for x in r[vec_col]]
        # the rows are already driver-side — validate the trained
        # dimension here for free (a short vector would otherwise die
        # in an opaque IndexError below; a long one would silently
        # score only its prefix while _qn uses the full vector)
        if len(qv) != dim:
            raise ValueError(
                f"pq search query {r[id_col]!r}: vector dimension "
                f"{len(qv)} does not match the codebooks' trained "
                f"dimension {dim} (m={m} x dsub={dsub})"
            )
        qn = sum(x * x for x in qv) ** 0.5
        flat = [
            sum(
                qv[j * dsub + t] * books[j][c][t] for t in range(dsub)
            )
            for j in range(m)
            for c in range(ksub)
        ]
        tbl_rows.append((r[id_col], flat, qn))
    qtbl = spark.createDataFrame(
        tbl_rows, "query_id long, _tbl array<double>, _qn double"
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("_tbl"),
            j * ksub + F.element_at(F.col("_codes"), j + 1) + 1,
        ),
    )
    scored = (
        codes.crossJoin(F.broadcast(qtbl))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (adc / (F.col("_qn") * F.col("_norm"))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    if rerank:
        shortlist = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= rerank * k)
            .select("query_id", "neighbor_id")
        )
        vecs = rerank_corpus.select(
            F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"),
            _to_double(F.col(vec_col)).alias("_qv"),
        )
        exact = (
            shortlist.join(
                vecs.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id"
            )
            .join(F.broadcast(qv), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("_qv"), F.col("_v")).alias("cosine_sim"),
            )
        )
        return (
            exact.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(
                "query_id", "neighbor_id", "cosine_sim",
                F.col("rnk").cast("int").alias("rnk"),
            )
        )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def pq_build_index(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE PQ index of a corpus — the PQ twin of
    :func:`ivf_build_index`, closing the last train-per-run family:
    train codebooks once, store, and every later batch searches (or
    appends to) the stored relations.

    Returns ``(codebooks, codes)``:

    * ``codebooks`` — ``(j int, c int, centroid array<double>)``:
      subspace j's centroid c (m x ksub rows, tiny by construction);
    * ``codes`` — ``(id_col, _codes array<int>, _norm double)``:
      every corpus vector compressed to m subspace codes plus its
      true norm — dim/m x fewer bytes than the raw vectors, which is
      what the ADC scan reads at 100 TB.

    Persistence contract: write both to parquet; reload and hand to
    :func:`pq_topk_vs_index` / :func:`pq_index_append`.  Round-trip
    equality with the train-per-run path is pinned in
    tests/test_similarity.py.
    """
    books, _dim = _pq_codebooks(corpus, m, ksub, id_col, vec_col)
    spark = corpus.sparkSession
    codebooks = spark.createDataFrame(
        [
            (j, c, books[j][c])
            for j in range(m)
            for c in range(ksub)
        ],
        "j int, c int, centroid array<double>",
    )
    codes = pq_encode_vectorized(
        spread(corpus), m, ksub, id_col, vec_col, books=books
    )
    return codebooks, codes


def _stored_codebooks(codebooks):
    """Collect + validate a stored codebook table: dense (j, c) grid
    0..m-1 x 0..ksub-1, uniform subvector width.  Returns
    ``(books, m, ksub)``.

    Accepts either the codebook DataFrame or an already-collected
    ``(books, m, ksub)`` tuple from a previous call (r15, guide §5:
    callers driving several appends/searches against ONE stored index
    were paying a driver collect job per operator call — collect and
    validate once, thread the tuple through)."""
    if isinstance(codebooks, tuple):
        return codebooks
    rows = _collect_bounded(
        codebooks.select("j", "c", "centroid").orderBy("j", "c"),
        MAX_CENTROIDS,
        "PQ codebook table",
    )
    if not rows:
        raise ValueError("empty codebook table: build the index first")
    m = rows[-1]["j"] + 1
    ksub = rows[-1]["c"] + 1
    if len(rows) != m * ksub or [
        (r["j"], r["c"]) for r in rows
    ] != [(j, c) for j in range(m) for c in range(ksub)]:
        raise ValueError(
            "codebook table must carry the dense (j, c) grid "
            "0..m-1 x 0..ksub-1 (ADC indexes subspace tables by "
            "position); rebuild via pq_build_index"
        )
    books = [
        [list(map(float, rows[j * ksub + c]["centroid"]))
         for c in range(ksub)]
        for j in range(m)
    ]
    widths = {len(c) for b in books for c in b}
    if len(widths) != 1:
        raise ValueError(
            f"codebook table has mixed subvector widths {sorted(widths)}"
        )
    return books, m, ksub


def pq_index_append(
    codebooks,
    codes: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The WRITE path of the persisted PQ lifecycle: encode a new
    ingest batch under the STORED codebooks and return the grown codes
    relation — no retraining, no history re-encode; work is
    O(|batch| x ksub x dim) narrow compute, and at the storage layer
    the new rows append to the codes parquet.  Batch ids must be
    disjoint from stored ids (redeliveries collapse upstream — the
    same contract as :func:`ivf_index_append`).  Codebook DRIFT is the
    documented limit, identical to the IVF append path: a shifted
    batch distribution degrades code quantization error, not
    correctness; rebuild via :func:`pq_build_index` when recall
    contracts flag it."""
    books, m, ksub = _stored_codebooks(codebooks)
    _require_dim(
        batch, vec_col, m * len(books[0][0]), "pq_index_append batch"
    )
    # executor-side guard (same rationale as ivf_index_append): a
    # mixed-width batch fails the ingest instead of persisting
    # corrupt codes
    batch = _enforce_dim(
        batch, vec_col, m * len(books[0][0]), "pq_index_append batch"
    )
    # spread() like every sibling encode entry point: a single-split
    # daily batch would otherwise encode on ONE task
    new_codes = pq_encode_vectorized(
        spread(batch), m, ksub, id_col, vec_col, books=books
    )
    cols = [id_col, "_codes", "_norm"]
    return codes.select(*cols).unionByName(new_codes.select(*cols))


def pq_topk_vs_index(
    codebooks,
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """ADC search of a query batch against a STORED PQ index
    (:func:`pq_build_index`, typically reloaded from parquet): no
    re-training, no corpus re-encode; the scan reads the compressed
    codes relation (m bytes + a norm per vector), and only the
    ``rerank * k`` shortlist per query touches true vectors —
    ``corpus`` is the same stored table the codes were built from,
    joined selectively by id for the exact rerank (pass the raw
    parquet relation; the join prunes it to shortlist rows).
    ``rerank=0`` never touches it.

    Output: (query_id, neighbor_id, cosine_sim, rnk) — identical
    contract to :func:`pq_topk`; searching an index built from the
    same corpus returns the identical result (pinned in tests).
    """
    books, m, ksub = _stored_codebooks(codebooks)
    enc = codes.select(
        F.col(id_col).alias("neighbor_id"), "_codes", "_norm"
    )
    return _pq_search(
        books, enc, corpus, queries, k, m, ksub, rerank, id_col, vec_col,
        max_queries,
    )

def pq_code_stats(codebooks: DataFrame, codes: DataFrame) -> DataFrame:
    """Per-subspace code-usage diagnostics over a stored PQ codes
    relation — the PQ REBUILD TRIGGER, giving the PQ family the same
    drift monitor :func:`ivf_cell_stats` gives IVF (the r9 lifecycle
    asymmetry): :func:`pq_index_append` encodes under STORED codebooks,
    so a shifted ingest distribution skews each subquantizer's code
    histogram long before ADC recall degrades — quantization error
    rises silently; code usage is the observable.

    Output: ``(j, c, n, frac, skew)`` per OCCUPIED (subspace, code)
    pair — ``frac`` = the code's share of subspace ``j``'s rows (every
    vector contributes exactly one code per subspace, so each
    subspace's fracs sum to 1), ``skew`` = n / (total / ksub) with
    ksub read from the TRAINED codebook table (empty codes vanish
    from a groupBy; normalizing by the trained ksub keeps the mean
    honest, the ``ivf_cell_stats`` ``n_centroids`` rule).  A healthy
    index reads ~1.0 everywhere; a drifted one shows hot codes >> 1.

    Plan shape: one ``posexplode`` (m rows per vector, a narrow map)
    into one groupBy (<= m x ksub rows out) + a per-subspace window
    total over those bounded rows — no join, no collect of the codes
    relation; the SinglePartition-free aggregate scales with the
    corpus exactly like any count.

    A code outside the trained ``[0, ksub)`` range, a subspace index
    outside ``[0, m)``, or a codes relation whose vectors do not all
    carry exactly ``m`` codes means the relation does not belong to
    this codebook table (a corrupted or mismatched store) — the
    monitor fails loudly rather than folding the impossible bin into
    the histogram (the ``ivf_cell_stats`` stale-k rule: a
    silently-wrong monitor is worse than none).  The guard is folded
    into BOTH ``frac`` and ``skew`` so a caller projecting either
    column still executes it — Catalyst prunes unreferenced columns,
    so a single-column guard protects only that column's readers.

    EAGER AT CALL TIME (documented contract, r11 ADVICE): unlike most
    plan builders in this module, this function runs TWO small Spark
    jobs before returning — the ``_stored_codebooks`` 1-row probe and
    a ``limit(1)`` emptiness probe of the codes relation — so it can
    raise the empty-store/mismatched-store diagnosis AT THE CALL SITE
    instead of deep inside a later action (where the row-expression
    guards never fire on a zero-row relation and the caller's
    ``max(skew)`` gate would die with a bare ``TypeError``).  Callers
    constructing monitoring plans ahead of time should call this at
    monitor-execution time, not plan-declaration time; both probes
    are O(1) reads, not scans.
    """
    from pyspark.sql import Window

    _books, m, ksub = _stored_codebooks(codebooks)
    # Row-expression guards never fire on a ZERO-ROW relation, so an
    # emptied/lost codes store would otherwise return empty stats and
    # crash the caller's max(skew) gate with a bare TypeError instead
    # of the contract's diagnosis (r11 review); the limit-1 probe is
    # the _stored_codebooks empty-table rule applied to the codes side
    if codes.limit(1).isEmpty():
        raise ValueError(
            "pq_code_stats: empty codes relation — nothing to monitor "
            "(build or append the index first; an unexpectedly empty "
            "store means the codes dir was emptied or mis-addressed)"
        )
    # posexplode_OUTER: a vector with an EMPTY (or null) _codes array
    # must not silently vanish from the histogram — it surfaces as a
    # null (j, c) bin and trips the per-bin guard below (a plain
    # posexplode drops the row, and the shape guard cannot see it:
    # the remaining subspaces still balance)
    occ = (
        codes.select(F.posexplode_outer("_codes").alias("j", "c"))
        .groupBy("j", "c")
        .agg(F.count("*").alias("n"))
    )
    # null-on-success assertion folded into the emitted expressions so
    # it cannot be pruned away (the ivf_cell_stats guard pattern):
    # per-bin, both axes must be present and sit inside the TRAINED
    # (m, ksub) grid.
    guard = F.assert_true(
        F.col("j").isNotNull()
        & F.col("c").isNotNull()
        & (F.col("c") >= 0)
        & (F.col("c") < ksub)
        & (F.col("j") >= 0)
        & (F.col("j") < m),
        F.concat(
            F.lit("pq_code_stats: bin (j="),
            F.coalesce(F.col("j").cast("string"), F.lit("null")),
            F.lit(", c="),
            F.coalesce(F.col("c").cast("string"), F.lit("null")),
            F.lit(f") outside the trained grid [0, {m}) x [0, {ksub}) "
                  "— the codes relation does not match this codebook "
                  "table (a null bin means a vector carried an empty "
                  "or null _codes array)"),
        ),
    ).cast("double")
    total = F.sum("n").over(Window.partitionBy("j"))
    stats = occ.select(
        "j",
        "c",
        "n",
        (F.col("n") / total + F.coalesce(guard, F.lit(0.0))).alias("frac"),
        (
            F.col("n") * F.lit(ksub) / total
            + F.coalesce(guard, F.lit(0.0))
        ).alias("skew"),
        total.alias("_tot"),
    )
    # Shape guard over the BOUNDED aggregate (<= m x ksub rows): every
    # vector contributes exactly one code per subspace, so a codes
    # relation encoded under this codebook table must occupy exactly m
    # distinct subspaces with identical per-subspace totals.  Vectors
    # encoded under a different m (extra subspaces -> j >= m above;
    # missing/ragged subspaces -> unequal totals or < m subspaces)
    # fail here instead of folding in silently.
    whole = Window.partitionBy()
    shape_guard = F.assert_true(
        (F.size(F.collect_set("j").over(whole)) == m)
        & (F.min("_tot").over(whole) == F.max("_tot").over(whole)),
        F.lit(
            f"pq_code_stats: codes relation does not carry exactly "
            f"{m} codes per vector — it was not encoded under this "
            "codebook table"
        ),
    ).cast("double")
    return stats.select(
        "j",
        "c",
        "n",
        (F.col("frac") + F.coalesce(shape_guard, F.lit(0.0))).alias("frac"),
        (F.col("skew") + F.coalesce(shape_guard, F.lit(0.0))).alias("skew"),
    )
