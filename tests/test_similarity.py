"""Vector-similarity operator tests with hand-checkable geometry."""

from __future__ import annotations

import math

from pyspark.sql import Row

from conftest import SF_DIR

from mysql_clickhouse_sync_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_pairs,
)


def _vecs(spark, vectors):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk_exact(spark):
    df = _vecs(
        spark,
        [
            [1, 0, 0, 0],   # 0: query
            [1, 0.1, 0, 0], # 1: nearly parallel -> top neighbor
            [0, 1, 0, 0],   # 2: orthogonal
            [-1, 0, 0, 0],  # 3: opposite
        ],
    )
    out = brute_force_topk(df, df.filter("vec_id = 0"), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert ranked == [1, 2, 3]
    top = next(r for r in out if r["rnk"] == 1)
    # embeddings are stored float32, so compare at float32 precision
    assert abs(top["cosine_sim"] - 1 / math.sqrt(1.01)) < 1e-6


def test_topk_excludes_self_and_respects_k(spark):
    df = _vecs(spark, [[1, 0], [0.9, 0.1], [0.8, 0.2], [0.7, 0.3]])
    out = brute_force_topk(df, df, k=2)
    per_q = {}
    for r in out.collect():
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 2 for v in per_q.values())


def test_lsh_bucketed_pairs_finds_parallel_vectors(spark):
    # Two near-parallel clusters pointing in opposite directions.
    df = _vecs(
        spark,
        [
            [1, 0.01, 0, 0],
            [1, 0.02, 0, 0],
            [-1, 0.01, 0, 0],
            [-1, 0.02, 0, 0],
        ],
    )
    pairs = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in lsh_bucketed_pairs(df, dim=4, min_cosine=0.9).collect()}
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    assert (0, 2) not in pairs  # opposite direction: different buckets
    assert pairs[(0, 1)] > 0.999


def test_ivf_topk_high_recall_vs_brute_force(spark):
    """IVF with nprobe=4 of 8 centroids should recover most true
    neighbors on a small corpus; exact per-query ordering and
    determinism are required regardless of recall."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = ivf_topk(emb, queries, k=3, n_centroids=8, nprobe=4)
    exact = brute_force_topk(emb, queries, k=3)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert got, "IVF returned nothing"
    # every query produced ranked results with rnk starting at 1
    per_q = {}
    for r in ivf.collect():
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v)[0] == 1 for v in per_q.values())
    # recall@3 with half the lists probed should be decent
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"recall {recall}"
    # deterministic across runs
    again = {(r.query_id, r.neighbor_id) for r in ivf_topk(
        emb, queries, k=3, n_centroids=8, nprobe=4).collect()}
    assert got == again


def test_vectorized_topk_matches_fold_path(spark):
    """Same neighbors as the JVM fold implementation (scores may
    differ in the last ulp; random vectors make exact ties
    improbable, so the sets must agree)."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    fold = {(r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=4).collect()}
    vec = {(r.query_id, r.neighbor_id)
           for r in brute_force_topk_vectorized(emb, queries, k=4).collect()}
    assert fold == vec


def test_quantized_codes_are_int8_bounded(spark):
    """Codes stay in [-127, 127]; scale/norm positive; shape kept."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from mysql_clickhouse_sync_spark.operators.similarity import (
        quantize_vectors,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    qv = quantize_vectors(emb)
    stats = qv.select(
        F.array_max("_qv").alias("mx"),
        F.array_min("_qv").alias("mn"),
        "_scale",
        "_norm",
        F.size("_qv").alias("dim"),
    ).agg(
        F.max("mx"), F.min("mn"), F.min("_scale"), F.min("_norm"),
        F.min("dim"), F.max("dim"),
    ).first()
    assert stats[0] <= 127 and stats[1] >= -127
    assert stats[2] > 0 and stats[3] > 0
    assert stats[4] == stats[5]  # constant dimensionality


def test_quantized_topk_recall_vs_exact(spark):
    """SQ8 approximate top-5 must keep recall@5 >= 0.8 against the
    exact brute-force answer over the same corpus/queries."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = quantized_topk(emb, queries, k=5).collect()

    def sets(rows):
        d = {}
        for r in rows:
            d.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return d

    es, qs = sets(exact), sets(approx)
    assert set(es) == set(qs)
    hits = sum(len(es[q] & qs[q]) for q in es)
    total = sum(len(es[q]) for q in es)
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_bounded_side_contracts_fail_fast(spark):
    """An oversized query set must raise instead of silently
    collecting/broadcasting the corpus to the driver (round-2 verdict
    item 6)."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
        ivf_topk,
        quantized_topk,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    for fn in (
        brute_force_topk,
        brute_force_topk_vectorized,
        ivf_topk,
        quantized_topk,
    ):
        with pytest.raises(ValueError, match="bounded-side contract"):
            fn(vecs, vecs, k=2, max_queries=5)
    # at or under the bound: runs fine
    small = vecs.limit(3)
    assert brute_force_topk(vecs, small, k=2, max_queries=5).count() > 0


def test_ivf_parameter_validation(spark):
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import ivf_topk

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="n_centroids"):
        ivf_topk(vecs, vecs.limit(1), n_centroids=10 ** 9)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_topk(vecs, vecs.limit(1), n_centroids=4, nprobe=9)


def test_pq_topk_rerank_recall_and_determinism(spark):
    """PQ/ADC with the exact-rerank refinement must recover most true
    neighbors (codes alone cannot on low-structure data — that is why
    rerank exists) and be bit-deterministic across runs."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = pq_topk(emb, queries, k=3)
    exact = brute_force_topk(emb, queries, k=3)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert got, "PQ returned nothing"
    recall = len(got & want) / len(want)
    assert recall >= 0.7, f"recall {recall}"
    again = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, queries, k=3).collect()
    }
    assert got == again


def test_pq_encode_shape_and_bounds(spark):
    from mysql_clickhouse_sync_spark.operators.similarity import pq_encode
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    enc = pq_encode(emb, m=8, ksub=16).collect()
    assert all(len(r["_codes"]) == 8 for r in enc)
    assert all(0 <= c < 16 for r in enc for c in r["_codes"])
    assert all(r["_norm"] > 0 for r in enc)


def test_pq_topk_bounded_side_contract(spark):
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import pq_topk

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5, 0.1] * 4) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="bounded-side contract"):
        pq_topk(vecs, vecs, k=2, m=4, ksub=8, max_queries=5)


def test_ivf_trained_centroids_recall_at_registered_config(spark):
    """Round-4 verdict item: IVF centroids are TRAINED (spherical
    k-means on a bounded sample, reusing the PQ Lloyd's kernel), and
    at the registered query's configuration (16 lists, nprobe=8) mean
    recall@5 against the exact path must clear the 0.8 contract the
    driver oracle enforces."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = {}
    for r in ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=8).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & ns) / len(ns) for q, ns in want.items()]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"mean recall@5 {mean_recall}"
    assert min(recalls) >= 0.4, f"min recall@5 {min(recalls)}"


def test_ivf_centroids_are_trained_and_unit_norm(spark):
    """Trained centroids differ from the raw first-N vectors (Lloyd's
    moved them) and are unit-normalized (so dot-product ranking equals
    cosine ranking)."""
    import math

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_centroids,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = ivf_centroids(emb, 16)
    assert len(cents) == 16
    for c in cents:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
    first = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    fn = math.sqrt(sum(float(x) ** 2 for x in first))
    # centroid 0 started at vector 0 but k-means moved it off the raw
    # (normalized) vector — if training were a no-op these would match
    drift = sum(
        (c - float(x) / fn) ** 2 for c, x in zip(cents[0], first)
    )
    assert drift > 1e-6, "centroids identical to first-N sample: untrained"


def test_semantic_centroid_count_keeps_buckets_under_guard():
    """The r3 scale-killer: a fixed k=8 quantizer at 100x corpus size
    pushes every bucket past the max_bucket=4096 guard and the guard
    drops ALL mass.  The sizing rule must keep the expected bucket
    ~1000 members — under half the guard — at every corpus size."""
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _semantic_centroid_count,
    )

    for n in (0, 1, 500, 5_000, 8_000, 100_000, 10**6, 10**9, 10**12):
        k = _semantic_centroid_count(n)
        assert k >= 8
        assert n / k <= 1001, f"n={n}: expected bucket {n / k} too big"
    # harness scale pins k=8, matching the oracle's LIMIT 8
    assert _semantic_centroid_count(500) == 8
    assert _semantic_centroid_count(5_000) == 8


def test_semantic_dedup_retains_full_corpus_mass(spark):
    """No whole-bucket drops on the harness corpus (the guard is a
    degenerate-quantizer safety net, not a sampling mechanism): every
    input vector must appear in the output exactly once."""
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _semantic_dedup_impl,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    out = _semantic_dedup_impl(emb)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()


def test_ann_recall_audit_arithmetic(spark):
    """The audit helper the driver contracts depend on: per-query
    matched counts, missing-query fill, and the exact integer /
    half-integer mean bound."""
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _ann_recall_audit,
    )

    def pairs(rows):
        return spark.createDataFrame(
            [Row(query_id=q, neighbor_id=n) for q, n in rows],
            "query_id long, neighbor_id long",
        )

    exact = pairs([(1, 10), (1, 11), (2, 10), (2, 12)])   # k=2 per query
    ann = pairs([(1, 10), (1, 99), (2, 10), (2, 12)])     # q1: 1/2, q2: 2/2
    out = {
        r.query_id: r
        for r in _ann_recall_audit(
            ann, exact, min_matched=2, mean_min_matched=1.5
        ).collect()
    }
    assert out[1].n_returned == 2 and out[1].recall_ok is False
    assert out[2].n_returned == 2 and out[2].recall_ok is True
    # total matched = 3 >= 1.5 * 2 queries -> mean bound holds
    assert out[1].mean_recall_ok is True and out[2].mean_recall_ok is True
    # a query the ANN missed entirely -> n_returned 0, recall_ok False
    out2 = {
        r.query_id: r
        for r in _ann_recall_audit(
            pairs([(1, 10)]), exact, min_matched=1, mean_min_matched=1.0
        ).collect()
    }
    assert out2[2].n_returned == 0 and out2[2].recall_ok is False
    # mean: total matched 1 < 1.0 * 2 queries -> bound fails
    assert out2[1].mean_recall_ok is False


def test_hyperplane_signature_supports_full_64_planes(spark):
    """n_planes=64 must build and use the long's sign bit: the i=63
    weight is 2^63, which overflows a bigint LITERAL — the weight must
    be emitted as shiftleft(1L, 63) (regression: the first parsed-
    literal formulation failed with INVALID_NUMERIC_LITERAL_RANGE at
    plan construction for a previously-valid public argument)."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        hyperplane_signature,
    )

    df = spark.createDataFrame(
        [([float(i % 7) - 3.0 for i in range(64)],),
         ([3.0 - float(i % 5) for i in range(64)],)],
        "embedding array<double>",
    )
    sigs = [
        r["s"]
        for r in df.select(
            hyperplane_signature(F.col("embedding"), 64, 64).alias("s")
        ).collect()
    ]
    assert len(sigs) == 2 and sigs[0] != sigs[1]


def test_bucket_cosine_pairs_vectorized_matches_fold(spark):
    """The Arrow/numpy bucket pair kernel must select EXACTLY the
    pairs the interpreted fold selects: sequential-order accumulation
    (acc = acc + a_i*b_i, dimension by dimension, via out= buffers)
    performs the identical IEEE-754 multiply/add sequence, so every
    dot product is the same double and every >= threshold decision
    matches — pinned on the PRODUCTION assignment stage
    (_semantic_assignment, the same code _semantic_dedup_impl runs)."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from mysql_clickhouse_sync_spark.operators.dedup import bucket_pairs
    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vectorized,
        dot as vdot,
    )
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _semantic_assignment,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb_raw = load_table(spark, SF_DIR, "embeddings")
    assigned = _semantic_assignment(emb_raw).localCheckpoint()

    fold = set(
        map(
            tuple,
            bucket_pairs(
                assigned.select("cid", "vec_id", "u"),
                ["cid"],
                F.struct(F.col("vec_id"), F.col("u")),
                max_bucket=4096,
            )
            .filter(vdot(F.col("a.u"), F.col("b.u")) >= 0.35)
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
            )
            .collect(),
        )
    )
    vec = set(
        map(
            tuple,
            bucket_cosine_pairs_vectorized(
                assigned, "cid", "vec_id", "u",
                threshold=0.35, max_bucket=4096,
            ).collect(),
        )
    )
    assert fold == vec and len(vec) > 0


def test_folded_literal_rejects_non_finite(spark):
    """A NaN/Inf component in a plan-folded constant must fail at
    construction with the REAL cause (corrupt embedding), not a SQL
    parse error deep in py4j — the 'nan'/'inf' repr does not parse."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        _sql_double_literals,
    )

    assert _sql_double_literals([1.0, -2.5]) == "1.0D,-2.5D"
    with pytest.raises(ValueError, match="non-finite"):
        _sql_double_literals([1.0, float("nan")])
    with pytest.raises(ValueError, match="non-finite"):
        _sql_double_literals([float("inf")])


def test_ivf_centroids_drop_non_finite_sample_rows(spark):
    """One corrupt vector in the training sample must not poison every
    centroid (NaN means propagate through each Lloyd's mean): corrupt
    rows drop from the SAMPLE; the trained quantizer stays finite and
    foldable."""
    import math

    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_centroids,
    )

    base = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double") + F.lit(0.5),
            (F.col("id") % 3).cast("double") - F.lit(1.0),
        ).alias("embedding"),
    )
    corrupt = spark.range(1).select(
        F.lit(999).cast("long").alias("vec_id"),
        F.array(
            F.lit(float("nan")), F.lit(1.0)
        ).alias("embedding"),
    )
    cents = ivf_centroids(base.unionByName(corrupt), 4)
    assert len(cents) == 4
    assert all(math.isfinite(x) for c in cents for x in c)


def test_bucket_pairs_vectorized_id_type_contract(spark):
    """Kernel output ids follow the INPUT id type (int stays int), and
    a non-integral id fails at planning with a clear error instead of
    inside the executor-side Arrow kernel."""
    import pytest
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vectorized,
    )

    df = spark.range(6).select(
        F.col("id").cast("int").alias("vec_id"),
        F.lit(0).alias("cid"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("u"),
    )
    out = bucket_cosine_pairs_vectorized(df, "cid", "vec_id", "u", 0.5)
    assert dict(out.dtypes) == {"id_a": "int", "id_b": "int"}
    assert out.count() == 15  # all 6 identical unit vectors pair up

    bad = df.select(F.col("vec_id").cast("string").alias("vec_id"),
                    "cid", "u")
    with pytest.raises(TypeError, match="integral id"):
        bucket_cosine_pairs_vectorized(bad, "cid", "vec_id", "u", 0.5)


def test_ivf_raw_equals_twin_search_stage(spark):
    """Machine-check of "emb_ivf_topk_raw == emb_ivf_topk minus the
    recall audit" (round-5 verdict item 2): the registered raw entry
    must return exactly the search results the graded twin audits —
    same trained quantizer, same nprobe, same top-5.  Shared stage
    function makes it true by construction; this pins the wiring."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.registry import all_queries
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _ivf_search_stage,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    sf01 = "/root/testdata/sf0.01"
    raw = sorted(
        map(
            tuple,
            all_queries()["emb_ivf_topk_raw"].fn(spark, sf01).collect(),
        )
    )
    emb = load_table(spark, sf01, "embeddings")
    stage = sorted(
        map(
            tuple,
            _ivf_search_stage(
                emb, emb.filter(F.col("vec_id") % 25 == 0)
            ).collect(),
        )
    )
    assert raw == stage and len(raw) > 0


def test_ivf_index_parquet_round_trip(spark, tmp_path):
    """The IVF index is the persistable artifact of the stored-corpus
    ANN lifecycle (operators/similarity.py: ivf_build_index).  Prove
    the seam: write centroids + postings to parquet (postings
    partitioned by cell, the layout that makes probes prune the scan),
    RELOAD both (fresh lineage, schema from disk), search a batch
    against the reloaded relations, and assert results identical to
    (a) the in-plan index and (b) the train-per-run ivf_topk over the
    same corpus — nothing depends on in-memory lineage, only on the
    stored rows."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_topk,
        ivf_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") % 50 == 1)

    centroids, postings = ivf_build_index(corpus, n_centroids=8)
    cdir, pdir = str(tmp_path / "cents"), str(tmp_path / "postings")
    centroids.write.parquet(cdir)
    postings.write.partitionBy("_cid").parquet(pdir)
    r_cents = spark.read.parquet(cdir)
    r_post = spark.read.parquet(pdir)

    key = lambda rows: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.rnk) for r in rows
    }
    from_disk = key(
        ivf_topk_vs_index(r_cents, r_post, queries, k=3, nprobe=4).collect()
    )
    in_plan = key(
        ivf_topk_vs_index(centroids, postings, queries, k=3, nprobe=4)
        .collect()
    )
    fresh_train = key(
        ivf_topk(corpus, queries, k=3, n_centroids=8, nprobe=4).collect()
    )
    assert from_disk == in_plan == fresh_train
    assert len(from_disk) > 0


def test_ivf_index_append_equals_fresh_assignment(spark, tmp_path):
    """The WRITE path of the persisted-index lifecycle
    (operators/similarity.py: ivf_index_append): appending a batch to
    a stored index must equal assigning the UNION corpus under the
    same stored centroids — so searches over the grown index serve
    exactly what a from-scratch assignment would.  Also proves the
    storage shape (append lands as new rows in the _cid-partitioned
    directory; history never rewritten) and batch associativity
    (two sub-batches == one batch)."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        _assign_postings,
        _stored_centroids,
        ivf_build_index,
        ivf_index_append,
        ivf_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    stored = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)
    queries = emb.filter(F.col("vec_id") % 50 == 1)

    centroids, postings = ivf_build_index(stored, n_centroids=8)
    grown = ivf_index_append(centroids, postings, batch)

    # equality with the from-scratch assignment under the SAME cents
    cents = _stored_centroids(centroids, "test")
    union = emb.filter(F.col("vec_id") % 2 == 0)
    fresh = _assign_postings(union, cents, "vec_id", "embedding")
    key = lambda rows: {(r.vec_id, r._cid, r._cn) for r in rows}  # noqa: E731
    assert key(grown.collect()) == key(fresh.collect())

    # storage shape: stored write + appended write into the same
    # partitioned directory; reload serves the identical search
    pdir, cdir = str(tmp_path / "postings"), str(tmp_path / "cents")
    centroids.write.parquet(cdir)
    postings.write.partitionBy("_cid").parquet(pdir)
    new_only = ivf_index_append(
        centroids, postings.limit(0), batch
    )
    new_only.write.mode("append").partitionBy("_cid").parquet(pdir)
    r_cents, r_post = spark.read.parquet(cdir), spark.read.parquet(pdir)
    skey = lambda rows: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.rnk) for r in rows
    }
    from_disk = skey(
        ivf_topk_vs_index(r_cents, r_post, queries, k=3, nprobe=4).collect()
    )
    in_plan = skey(
        ivf_topk_vs_index(centroids, grown, queries, k=3, nprobe=4).collect()
    )
    assert from_disk == in_plan and len(from_disk) > 0

    # associativity: appending in two halves == one batch
    b1 = batch.filter(F.col("vec_id") % 8 == 2)
    b2 = batch.filter(F.col("vec_id") % 8 == 6)
    two_step = ivf_index_append(
        centroids, ivf_index_append(centroids, postings, b1), b2
    )
    assert key(two_step.collect()) == key(grown.collect())


def test_pq_index_parquet_round_trip(spark, tmp_path):
    """The PQ index lifecycle twin of test_ivf_index_parquet_round_trip
    (operators/similarity.py: pq_build_index / pq_topk_vs_index):
    persist codebooks + codes, reload, search — identical to the
    in-plan index AND the train-per-run pq_topk (training is
    deterministic, so the stored books equal a fresh run's)."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_build_index,
        pq_topk,
        pq_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") % 50 == 1)

    codebooks, codes = pq_build_index(corpus, m=8, ksub=16)
    bdir, cdir = str(tmp_path / "books"), str(tmp_path / "codes")
    codebooks.write.parquet(bdir)
    codes.write.parquet(cdir)
    r_books, r_codes = spark.read.parquet(bdir), spark.read.parquet(cdir)

    key = lambda rows: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.rnk) for r in rows
    }
    from_disk = key(
        pq_topk_vs_index(
            r_books, r_codes, corpus, queries, k=3, rerank=5
        ).collect()
    )
    in_plan = key(
        pq_topk_vs_index(
            codebooks, codes, corpus, queries, k=3, rerank=5
        ).collect()
    )
    fresh_train = key(
        pq_topk(corpus, queries, k=3, m=8, ksub=16, rerank=5).collect()
    )
    assert from_disk == in_plan == fresh_train
    assert len(from_disk) > 0


def test_pq_index_append_equals_fresh_encode(spark):
    """pq_index_append must equal encoding the UNION corpus under the
    same stored codebooks (write-path equality), and appending in two
    sub-batches must equal one batch (associativity)."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        _stored_codebooks,
        pq_build_index,
        pq_encode_vectorized,
        pq_index_append,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    stored = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)

    codebooks, codes = pq_build_index(stored, m=8, ksub=16)
    grown = pq_index_append(codebooks, codes, batch)

    books, m, ksub = _stored_codebooks(codebooks)
    union = emb.filter(F.col("vec_id") % 2 == 0)
    fresh = pq_encode_vectorized(
        union, m, ksub, "vec_id", "embedding", books=books
    )
    key = lambda rows: {  # noqa: E731
        (r.vec_id, tuple(r._codes), r._norm) for r in rows
    }
    assert key(grown.collect()) == key(fresh.collect())

    b1 = batch.filter(F.col("vec_id") % 8 == 2)
    b2 = batch.filter(F.col("vec_id") % 8 == 6)
    two_step = pq_index_append(
        codebooks, pq_index_append(codebooks, codes, b1), b2
    )
    assert key(two_step.collect()) == key(grown.collect())


def test_ivf_cell_stats_reports_occupancy_and_skew(spark):
    """The drift monitor over a stored index: fractions sum to 1,
    a balanced index reads skew ~1, a planted hot cell reads its
    multiple, and n_centroids keeps the mean honest when trailing
    cells are empty."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_cell_stats,
    )

    postings = spark.createDataFrame(
        [(i, 0 if i < 60 else 1 + i % 2) for i in range(100)],
        "vec_id long, _cid int",
    )
    # cells: 0 -> 60 rows (hot), 1 -> 20, 2 -> 20
    got = {r.cid: r for r in ivf_cell_stats(postings).collect()}
    assert abs(sum(r.frac for r in got.values()) - 1.0) < 1e-12
    assert abs(got[0].skew - 1.8) < 1e-12          # 60 / (100/3)
    assert abs(got[1].skew - 0.6) < 1e-12
    # trained k = 4 with one EMPTY trailing cell: the mean uses k=4
    got4 = {r.cid: r for r in ivf_cell_stats(postings, 4).collect()}
    assert abs(got4[0].skew - 2.4) < 1e-12         # 60 / (100/4)
    # a stale/bogus trained k must fail, not deflate skew silently
    import pytest

    with pytest.raises(ValueError, match="positive"):
        ivf_cell_stats(postings, 0)
    with pytest.raises(Exception, match="stale trained k"):
        ivf_cell_stats(postings, 2).collect()      # 3 cells occupied


def test_semantic_ingest_runs_grow_once_and_matches_both_views(spark):
    """semantic_ingest = clustering + write-back from ONE grow run:
    its dedup view equals semantic_dedup_vs_index and its index
    relations equal semantic_index_append, for the same inputs."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        semantic_dedup_vs_index,
        semantic_index_append,
        semantic_index_build,
        semantic_ingest,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)
    idx = semantic_index_build(old)
    args = (idx["centroids"], idx["assigned"], idx["pairs"], batch)

    one = semantic_ingest(*args)
    dkey = lambda rows: {  # noqa: E731
        (r.vec_id, r.centroid_id, r.cluster_id, r.is_keeper, r.is_new)
        for r in rows
    }
    assert dkey(one["dedup"].collect()) == dkey(
        semantic_dedup_vs_index(*args).collect()
    )
    two = semantic_index_append(*args)
    pk = lambda rows: {(r.id_a, r.id_b) for r in rows}  # noqa: E731
    ak = lambda rows: {(r.vec_id, r.cid) for r in rows}  # noqa: E731
    assert ak(one["assigned"].collect()) == ak(two["assigned"].collect())
    assert pk(one["pairs"].collect()) == pk(two["pairs"].collect())


def test_stored_index_paths_reject_dim_mismatch(spark):
    """A batch/query feed from a DIFFERENT embedding space than the
    stored index must fail with the real cause: zip_with against
    folded centroid literals NULL-PADS a mismatched vector and
    silently mis-assigns every row (all to cell 0 — confirmed), which
    would persist a corrupt index; PQ's prefix-encode bias and bare
    IndexError are the same disease on the codes path."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_append,
        ivf_topk_vs_index,
        pq_build_index,
        pq_index_append,
        pq_topk_vs_index,
    )

    vecs4 = _vecs(spark, [[1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1],
                          [2, 1, 2, 1]] * 3)
    vecs6 = _vecs(spark, [[1, 0, 1, 0, 1, 0], [0, 1, 0, 1, 0, 1]])

    centroids, postings = ivf_build_index(vecs4, n_centroids=2)
    with pytest.raises(ValueError, match="dimension 6 .* 4"):
        ivf_index_append(centroids, postings, vecs6)
    with pytest.raises(ValueError, match="dimension 6 .* 4"):
        ivf_topk_vs_index(centroids, postings, vecs6, k=1, nprobe=1)

    codebooks, codes = pq_build_index(vecs4, m=2, ksub=4)
    with pytest.raises(ValueError, match="dimension 6 .* 4"):
        pq_index_append(codebooks, codes, vecs6)
    with pytest.raises(ValueError, match="dimension 6 .* trained"):
        pq_topk_vs_index(codebooks, codes, vecs4, vecs6, k=1)
    # short queries previously died in an opaque IndexError
    vecs2 = _vecs(spark, [[1, 0]])
    with pytest.raises(ValueError, match="dimension 2 .* trained"):
        pq_topk_vs_index(codebooks, codes, vecs4, vecs2, k=1)


def test_index_append_rejects_mixed_width_batch(spark):
    """A MIXED-width batch — first row the trained width, later rows
    wrong — sails past the 1-row _require_dim probe; the WRITE paths
    must still fail the job executor-side (in-plan assert_true folded
    into the vector column) rather than persist rows silently
    mis-assigned to cell 0 via zip_with null-padding."""
    import pytest
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_append,
        pq_build_index,
        pq_index_append,
    )

    vecs4 = _vecs(spark, [[1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1],
                          [2, 1, 2, 1]] * 3)
    mixed = spark.createDataFrame(
        [Row(vec_id=100, embedding=[1.0, 0.0, 0.0, 1.0]),   # trained width
         Row(vec_id=101, embedding=[1.0, 0.0, 1.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )

    centroids, postings = ivf_build_index(vecs4, n_centroids=2)
    grown = ivf_index_append(centroids, postings, mixed)  # lazy: plan ok
    with pytest.raises(Exception, match="mixed-width batch"):
        grown.collect()                                   # action fails

    codebooks, codes = pq_build_index(vecs4, m=2, ksub=4)
    grown_codes = pq_index_append(codebooks, codes, mixed)
    with pytest.raises(Exception, match="mixed-width batch"):
        grown_codes.collect()

    # the semantic grow core carries the same two-tier guard
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        semantic_index_append,
        semantic_index_build,
    )

    idx = semantic_index_build(vecs4)
    # the grow core's eager localCheckpoint materializes the batch at
    # CALL time, so the executor assert fires here, not at a collect
    with pytest.raises(Exception, match="mixed-width batch"):
        semantic_index_append(
            idx["centroids"], idx["assigned"], idx["pairs"], mixed
        )
    vecs6 = _vecs(spark, [[1, 0, 1, 0, 1, 0]])
    with pytest.raises(ValueError, match="dimension 6 .* 4"):
        semantic_index_append(
            idx["centroids"], idx["assigned"], idx["pairs"], vecs6
        )


def test_index_append_null_vector_fails_with_real_cause(spark):
    """A NULL vector in an ingest batch: F.size is NULL, so without a
    coalesce the assert fires with a NULL message (concat with a NULL
    operand nulls the whole diagnostic) — the guard must fail the job
    WITH the promised real-cause text, reporting dimension -1."""
    import pytest
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_append,
    )

    vecs4 = _vecs(spark, [[1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1],
                          [2, 1, 2, 1]] * 3)
    with_null = spark.createDataFrame(
        [Row(vec_id=100, embedding=[1.0, 0.0, 0.0, 1.0]),
         Row(vec_id=101, embedding=None)],
        "vec_id long, embedding array<float>",
    )
    centroids, postings = ivf_build_index(vecs4, n_centroids=2)
    grown = ivf_index_append(centroids, postings, with_null)
    with pytest.raises(Exception, match="dimension -1 .*NULL vector"):
        grown.collect()


def test_pq_vs_index_rejects_bad_codebook_table(spark):
    import pytest
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_build_index,
        pq_topk_vs_index,
    )

    vecs = _vecs(spark, [[1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1],
                         [2, 1, 2, 1]] * 5)
    codebooks, codes = pq_build_index(vecs, m=2, ksub=4)
    gappy = codebooks.filter(~((F.col("j") == 0) & (F.col("c") == 2)))
    with pytest.raises(ValueError, match="dense"):
        pq_topk_vs_index(gappy, codes, vecs, vecs.limit(1), k=1)
    with pytest.raises(ValueError, match="empty codebook"):
        pq_topk_vs_index(
            codebooks.limit(0), codes, vecs, vecs.limit(1), k=1
        )


def test_ivf_vs_index_prunes_postings_partitions(spark, tmp_path):
    """The stored-index search pushes a STATIC _cid IN (probed cells)
    filter, so against partitionBy('_cid') parquet the scan is
    partition-PRUNED — the IVF candidate reduction becomes an I/O
    reduction guaranteed at plan time, not a hope that dynamic
    pruning fires.  Pins: the executed plan carries a PartitionFilters
    entry on _cid, and pruning changes no results vs the unpruned
    core."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        _ivf_search,
        _stored_centroids,
        ivf_build_index,
        ivf_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") % 50 == 1)
    centroids, postings = ivf_build_index(corpus, n_centroids=8)
    pdir = str(tmp_path / "postings")
    postings.write.partitionBy("_cid").parquet(pdir)
    r_post = spark.read.parquet(pdir)

    ann = ivf_topk_vs_index(centroids, r_post, queries, k=3, nprobe=2)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    # the partition filter must actually constrain _cid (an empty
    # PartitionFilters: [] would still contain the header string)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "_cid" in m.group(1), m.group(0) if m else plan

    key = lambda rows: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.rnk) for r in rows
    }
    cents = _stored_centroids(centroids, "test")
    unpruned = _ivf_search(
        cents, r_post, queries, 3, 2, "vec_id", "embedding",
        65_536, prune_cells=False,
    )
    assert key(ann.collect()) == key(unpruned.collect())


def test_ivf_vs_index_rejects_bad_centroid_table(spark):
    import pytest
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_topk_vs_index,
    )

    vecs = _vecs(spark, [[1, 0], [0, 1], [1, 1], [2, 1]] * 3)
    centroids, postings = ivf_build_index(vecs, n_centroids=2)
    gappy = centroids.withColumn("cid", F.col("cid") + 5)
    with pytest.raises(ValueError, match="dense cids"):
        ivf_topk_vs_index(gappy, postings, vecs.limit(1), k=1, nprobe=1)
    with pytest.raises(ValueError, match="empty centroid table"):
        ivf_topk_vs_index(
            centroids.limit(0), postings, vecs.limit(1), k=1, nprobe=1
        )


def test_vs_index_pair_kernel_equals_restricted_full_kernel(spark):
    """The incremental pair kernel must emit EXACTLY the
    batch-involving subset of the full self-dedup kernel's pairs (same
    buckets, same threshold decisions — bit-equal scores by shared
    accumulation order), never an old-old pair."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vectorized,
        bucket_cosine_pairs_vs_index_vectorized,
    )
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _normalized_vectors,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    u = _normalized_vectors(emb).withColumn(
        "cid", (F.col("vec_id") % 5).cast("int")
    ).withColumn("_is_new", F.col("vec_id") % 2 == 1)

    thr = 0.2   # loose threshold so the set is non-trivially large
    full = {
        (r.id_a, r.id_b)
        for r in bucket_cosine_pairs_vectorized(
            u, "cid", "vec_id", "u", threshold=thr
        ).collect()
    }
    restricted = {
        (a, b) for a, b in full if (a % 2 == 1) or (b % 2 == 1)
    }
    incremental = {
        (r.id_a, r.id_b)
        for r in bucket_cosine_pairs_vs_index_vectorized(
            u, "cid", "vec_id", "u", "_is_new", threshold=thr
        ).collect()
    }
    assert incremental == restricted
    assert len(incremental) > 0
    assert all(a < b for a, b in incremental)


def test_vs_index_pair_kernel_rejects_non_integral_ids(spark):
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vs_index_vectorized,
    )

    df = spark.createDataFrame(
        [("a", 0, [1.0], True)],
        "vec_id string, cid int, u array<double>, _is_new boolean",
    )
    with pytest.raises(TypeError, match="integral id"):
        bucket_cosine_pairs_vs_index_vectorized(
            df, "cid", "vec_id", "u", "_is_new", 0.5
        )


def test_semantic_index_append_write_back(spark):
    """semantic_index_append returns the grown index relations — the
    write-back half of the daily loop.  Contracts: (a) the merged pair
    set equals the FULL self-dedup kernel over the grown assignments
    (merge equality: stored pairs ∪ batch-involving pairs = all
    within-cell pairs); (b) chaining two appends equals one append of
    the union batch; (c) the grown relations feed the next vs-index
    run unchanged."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vectorized,
    )
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _SEMANTIC_MAX_BUCKET,
        semantic_dedup_vs_index,
        semantic_index_append,
        semantic_index_build,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)

    idx = semantic_index_build(old)
    grown = semantic_index_append(
        idx["centroids"], idx["assigned"], idx["pairs"], batch
    )
    pkey = lambda rows: {(r.id_a, r.id_b) for r in rows}  # noqa: E731
    akey = lambda rows: {(r.vec_id, r.cid) for r in rows}  # noqa: E731

    # (a) merge equality vs the full kernel over grown assignments
    full = bucket_cosine_pairs_vectorized(
        grown["assigned"].localCheckpoint(), "cid", "vec_id", "u",
        threshold=0.35, max_bucket=_SEMANTIC_MAX_BUCKET,
    )
    assert pkey(grown["pairs"].collect()) == pkey(full.collect())

    # (b) chaining: append(b1) then append(b2) == append(b1 ∪ b2)
    b1 = batch.filter(F.col("vec_id") % 8 == 2)
    b2 = batch.filter(F.col("vec_id") % 8 == 6)
    step1 = semantic_index_append(
        idx["centroids"], idx["assigned"], idx["pairs"], b1
    )
    step2 = semantic_index_append(
        step1["centroids"], step1["assigned"], step1["pairs"], b2
    )
    assert akey(step2["assigned"].collect()) == akey(
        grown["assigned"].collect()
    )
    assert pkey(step2["pairs"].collect()) == pkey(grown["pairs"].collect())

    # (c) the grown relations serve the next vs-index run: a later
    # batch dedups against them without error and covers all rows
    later = emb.filter(F.col("vec_id") % 4 == 1).limit(50)
    out = semantic_dedup_vs_index(
        grown["centroids"], grown["assigned"], grown["pairs"], later
    )
    assert out.count() == grown["assigned"].count() + 50


def test_semantic_append_delta_equals_full_append(spark):
    """semantic_index_append_delta is the APPEND-ONLY write-back (the
    per-batch cost a parquet store actually pays): stored ∪ delta must
    equal semantic_index_append's full grown relations exactly while
    the over-cap guard stays empty — the equality contract the graded
    emb_semantic_compacted_dedup row's per-wave appends rely on."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        semantic_index_append,
        semantic_index_append_delta,
        semantic_index_build,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)
    idx = semantic_index_build(old)
    args = (idx["centroids"], idx["assigned"], idx["pairs"], batch)
    grown = semantic_index_append(*args)
    delta = semantic_index_append_delta(*args)
    assert delta["over_cap"].count() == 0
    akey = lambda rows: {(r.vec_id, r.cid) for r in rows}  # noqa: E731
    pkey = lambda rows: {(r.id_a, r.id_b) for r in rows}  # noqa: E731
    merged_assigned = akey(idx["assigned"].collect()) | akey(
        delta["assigned"].collect()
    )
    assert merged_assigned == akey(grown["assigned"].collect())
    merged_pairs = pkey(idx["pairs"].collect()) | pkey(
        delta["pairs"].collect()
    )
    assert merged_pairs == pkey(grown["pairs"].collect())
    # the delta is genuinely batch-sized: no stored row re-emitted
    assert delta["assigned"].count() == batch.count()
    assert (
        pkey(idx["pairs"].collect()) & pkey(delta["pairs"].collect())
        == set()
    )


def test_semantic_append_delta_over_cap_guard_fires(spark):
    """When a grown cell passes the cap, the merge rule drops stored
    pairs — inexpressible as an append — so the delta path must
    surface the cell in over_cap (the caller's rebuild trigger)."""
    import mysql_clickhouse_sync_spark.plans.similarity_queries as sq
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)
    idx = sq.semantic_index_build(old)
    orig = sq._SEMANTIC_MAX_BUCKET
    sq._SEMANTIC_MAX_BUCKET = 1  # every touched cell is over-cap
    try:
        delta = sq.semantic_index_append_delta(
            idx["centroids"], idx["assigned"], idx["pairs"], batch
        )
        assert delta["over_cap"].count() > 0
    finally:
        sq._SEMANTIC_MAX_BUCKET = orig


def test_semantic_index_parquet_round_trip(spark, tmp_path):
    """The semantic-dedup index (centroids + assignments + the
    corpus' own pairs) is the persistable artifact of incremental
    embedding dedup.  Prove the lifecycle: persist all three
    relations, RELOAD them, dedup a batch against the reloaded index,
    and assert the merged clustering is identical to the in-plan
    path."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        semantic_dedup_vs_index,
        semantic_index_build,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)

    idx = semantic_index_build(old)
    paths = {}
    for name, df in idx.items():
        paths[name] = str(tmp_path / name)
        if name == "assigned":
            df.write.partitionBy("cid").parquet(paths[name])
        else:
            df.write.parquet(paths[name])
    reloaded = {n: spark.read.parquet(p) for n, p in paths.items()}

    key = lambda rows: {  # noqa: E731
        (r.vec_id, r.centroid_id, r.cluster_id, r.is_keeper, r.is_new)
        for r in rows
    }
    from_disk = key(
        semantic_dedup_vs_index(
            reloaded["centroids"], reloaded["assigned"],
            reloaded["pairs"], new,
        ).collect()
    )
    in_plan = key(
        semantic_dedup_vs_index(
            idx["centroids"], idx["assigned"], idx["pairs"], new
        ).collect()
    )
    assert from_disk == in_plan
    n_total = emb.count()
    assert len(from_disk) == n_total
    assert sum(1 for t in from_disk if t[4]) == new.count()


def test_vs_index_pair_kernel_never_emits_self_pairs(spark):
    """A batch row REUSING a stored id (at-least-once redelivery of an
    already-indexed vector) must not pair with its own stored twin —
    min/max of positions would otherwise emit id_a == id_b and feed a
    self-loop edge to the component step (review finding)."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        bucket_cosine_pairs_vs_index_vectorized,
    )

    rows = [
        # stored: ids 1, 2; batch redelivers id 1 verbatim + adds 3
        (1, 0, [1.0, 0.0], False),
        (2, 0, [0.0, 1.0], False),
        (1, 0, [1.0, 0.0], True),
        (3, 0, [1.0, 0.0], True),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cid int, u array<double>, _is_new boolean"
    )
    got = {
        (r.id_a, r.id_b)
        for r in bucket_cosine_pairs_vs_index_vectorized(
            df, "cid", "vec_id", "u", "_is_new", threshold=0.9
        ).collect()
    }
    assert all(a != b for a, b in got)
    # the redelivered row still pairs with OTHER parallel vectors
    assert (1, 3) in got


def test_semantic_index_stores_nominal_k(spark):
    """The centroid relation persists the NOMINAL k its cell rule was
    derived from: for corpora below the k floor the centroid row
    count is smaller than k, and re-deriving n_coarse from count()
    at ingest would assign through a DIFFERENT cell split than the
    build used (review finding)."""
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        semantic_dedup_vs_index,
        semantic_index_build,
    )

    tiny = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(i == j) for j in range(4)])
            for i in range(3)
        ],
        "vec_id long, embedding array<float>",
    )
    idx = semantic_index_build(tiny)
    cents = idx["centroids"].collect()
    assert len(cents) == 3                      # rows = corpus size
    assert all(r["k_nominal"] == 8 for r in cents)   # nominal floor
    batch = spark.createDataFrame(
        [Row(vec_id=10, embedding=[1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup_vs_index(
        idx["centroids"], idx["assigned"], idx["pairs"], batch
    ).collect()
    # vec 10 duplicates vec 0 exactly -> same cluster, not a keeper
    by_id = {r.vec_id: r for r in out}
    assert by_id[10].cluster_id == 0 and not by_id[10].is_keeper
    assert len(out) == 4


def test_dedup_incremental_raw_equals_graded_prefix(spark):
    """Machine-check of "emb_dedup_incremental_raw == the graded
    row's pre-clustering prefix" (r7 verdict item 5): the bench-timed
    raw entry must return exactly the merged pair set that feeds the
    graded row's connected components — same stored quantizer (built
    from the even half), same batch assignment, same pair kernel —
    whether the index relations arrive freshly built or through the
    raw entry's parquet persist/reload.  Runs the raw entry TWICE so
    the second call exercises the stored-index reuse path bench's
    best-of-n actually times."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.registry import all_queries
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _semantic_grow,
        semantic_index_build,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    sf01 = "/root/testdata/sf0.01"
    fn = all_queries()["emb_dedup_incremental_raw"].fn
    first = sorted(map(tuple, fn(spark, sf01).collect()))
    reused = sorted(map(tuple, fn(spark, sf01).collect()))
    assert first == reused                  # stored-index reuse path

    emb = load_table(spark, sf01, "embeddings")
    idx = semantic_index_build(emb.filter(F.col("vec_id") % 2 == 0))
    _, all_pairs = _semantic_grow(
        idx["centroids"], idx["assigned"], idx["pairs"],
        emb.filter(F.col("vec_id") % 2 == 1),
    )
    prefix = sorted(
        map(tuple, all_pairs.select("id_a", "id_b").collect())
    )
    assert first == prefix and len(first) > 0


def test_append_chain_raw_equals_graded_prefix(spark):
    """Machine-check of "emb_dedup_append_chain_raw == the graded
    chain row's day-2 pre-clustering prefix" (r9 bench twin): the
    bench-timed raw entry must return exactly the merged pair set that
    feeds the graded row's connected components — same stored chain
    (build on A, day-1 append of B), same day-2 batch assignment, same
    pair kernel — whether the grown relations arrive freshly built or
    through the raw entry's parquet persist/reload.  Runs the raw
    entry TWICE so the second call exercises the stored-chain reuse
    path bench's best-of-n actually times."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.registry import all_queries
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _semantic_grow,
        semantic_index_append,
        semantic_index_build,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    sf01 = "/root/testdata/sf0.01"
    fn = all_queries()["emb_dedup_append_chain_raw"].fn
    first = sorted(map(tuple, fn(spark, sf01).collect()))
    reused = sorted(map(tuple, fn(spark, sf01).collect()))
    assert first == reused                  # stored-chain reuse path

    emb = load_table(spark, sf01, "embeddings")
    idx = semantic_index_build(emb.filter(F.col("vec_id") % 4 == 0))
    grown = semantic_index_append(
        idx["centroids"], idx["assigned"], idx["pairs"],
        emb.filter(F.col("vec_id") % 4 == 2),
    )
    _, all_pairs = _semantic_grow(
        grown["centroids"], grown["assigned"], grown["pairs"],
        emb.filter(F.col("vec_id") % 2 == 1),
    )
    prefix = sorted(
        map(tuple, all_pairs.select("id_a", "id_b").collect())
    )
    assert first == prefix and len(first) > 0


def test_pq_code_stats_contract(spark):
    """The PQ drift monitor: per-subspace fracs sum to 1, skew
    normalizes by the TRAINED ksub (empty codes vanish from the
    groupBy but must not inflate the occupied ones' baseline), and a
    skewed append — many copies of one vector, hence one hot code per
    subspace — pushes max skew to ~|batch| * ksub / total."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_build_index,
        pq_code_stats,
        pq_index_append,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "embedding")
    books, codes = pq_build_index(a, m=8, ksub=16)
    healthy = pq_code_stats(books, codes).collect()
    n_a = a.count()
    by_j = {}
    for r in healthy:
        assert 0 <= r["c"] < 16
        by_j.setdefault(r["j"], []).append(r)
        # skew = frac * ksub, normalized by the TRAINED ksub
        assert abs(r["skew"] - r["frac"] * 16) < 1e-12
    assert sorted(by_j) == list(range(8))
    for j, rows in by_j.items():
        assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-12
        assert sum(r["n"] for r in rows) == n_a

    # skewed append: every batch row carries A's min-id vector, so in
    # EVERY subspace the batch lands on one code
    u0 = a.orderBy("vec_id").limit(1).select(
        F.col("embedding").alias("_e0")
    )
    b = (
        emb.filter(F.col("vec_id") % 4 == 1)
        .select("vec_id")
        .crossJoin(F.broadcast(u0))
        .select("vec_id", F.col("_e0").alias("embedding"))
    )
    grown = pq_index_append(books, codes, b)
    drifted = pq_code_stats(books, grown)
    n_b = b.count()
    floor = 0.8 * n_b * 16 / (n_a + n_b)
    per_j_max = {
        r["j"]: r["skew"]
        for r in drifted.groupBy("j")
        .agg(F.max("skew").alias("skew"))
        .collect()
    }
    assert sorted(per_j_max) == list(range(8))
    for j, mx in per_j_max.items():
        assert mx >= floor, f"subspace {j}: max skew {mx} < {floor}"


def test_pq_code_stats_rejects_bad_codebooks(spark):
    """The monitor validates the codebook table exactly like the
    search path — a sparse grid means a corrupted store."""
    import pytest
    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_code_stats,
    )

    bad = spark.createDataFrame(
        [(0, 0, [0.0, 1.0]), (0, 2, [1.0, 0.0])],
        "j int, c int, centroid array<double>",
    )
    codes = spark.createDataFrame(
        [(1, [0, 0], 1.0)], "vec_id long, _codes array<int>, _norm double"
    )
    with pytest.raises(ValueError, match="dense"):
        pq_code_stats(bad, codes)


def test_compacted_search_raw_equals_fresh_stored_search(spark):
    """The bench-only maintenance twin must return exactly the search
    the graded emb_index_compacted_search audits: a compacted work
    dir searched with prune_cells equals a fresh stored-index search
    over the same grown corpus (build on the old slice, the three
    appended waves = the % 4 = 2 batch)."""
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        emb_index_compacted_search_raw,
    )
    from mysql_clickhouse_sync_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_append,
        ivf_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    raw = emb_index_compacted_search_raw(spark, SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 4 == 0)
    batch = emb.filter(F.col("vec_id") % 4 == 2)
    queries = emb.filter(F.col("vec_id") % 50 == 1)
    centroids, postings = ivf_build_index(old, n_centroids=16)
    grown = ivf_index_append(centroids, postings.localCheckpoint(), batch)
    want = ivf_topk_vs_index(
        centroids, grown, queries, k=5, nprobe=12, prune_cells=False
    )
    assert raw.exceptAll(want).count() == 0
    assert want.exceptAll(raw).count() == 0


def test_pq_code_stats_rejects_out_of_range_codes(spark):
    """A code outside the trained [0, ksub) range means the codes
    relation does not belong to this codebook table — the monitor
    fails loudly instead of folding the impossible bin in."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_code_stats,
    )

    books = spark.createDataFrame(
        [(j, c, [float(j), float(c)]) for j in range(2) for c in range(4)],
        "j int, c int, centroid array<double>",
    )
    codes = spark.createDataFrame(
        [(1, [0, 9], 1.0)],  # 9 >= ksub=4
        "vec_id long, _codes array<int>, _norm double",
    )
    with pytest.raises(Exception, match="outside the trained grid"):
        pq_code_stats(books, codes).collect()


def test_pq_code_stats_guard_survives_column_pruning(spark):
    """The fail-loudly contract must hold for a caller projecting
    only (j, c, n, frac) — the r10 advice gap: a guard folded only
    into skew is pruned away with it."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_code_stats,
    )

    books = spark.createDataFrame(
        [(j, c, [float(j), float(c)]) for j in range(2) for c in range(4)],
        "j int, c int, centroid array<double>",
    )
    codes = spark.createDataFrame(
        [(1, [0, 9], 1.0)],  # 9 >= ksub=4
        "vec_id long, _codes array<int>, _norm double",
    )
    pruned = pq_code_stats(books, codes).select("j", "c", "n", "frac")
    with pytest.raises(Exception, match="outside the trained grid"):
        pruned.collect()


def test_pq_code_stats_rejects_wrong_subspace_count(spark):
    """Codes encoded under a different m than the trained codebooks
    (extra or missing subspaces) fail loudly instead of folding in."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_code_stats,
    )

    books = spark.createDataFrame(
        [(j, c, [float(j), float(c)]) for j in range(2) for c in range(4)],
        "j int, c int, centroid array<double>",
    )
    # Three codes per vector under a trained m=2: the extra subspace
    # j=2 sits outside [0, m).
    extra = spark.createDataFrame(
        [(1, [0, 1, 2], 1.0)],
        "vec_id long, _codes array<int>, _norm double",
    )
    with pytest.raises(Exception, match="outside the trained grid"):
        pq_code_stats(books, extra).collect()
    # One code per vector under a trained m=2: in-range bins, but the
    # relation occupies only one subspace — the shape guard trips.
    short = spark.createDataFrame(
        [(1, [0], 1.0), (2, [1], 1.0)],
        "vec_id long, _codes array<int>, _norm double",
    )
    with pytest.raises(Exception, match="codes per vector"):
        pq_code_stats(books, short).collect()
    # Ragged: one full vector, one short — totals diverge across
    # subspaces even though both subspaces are occupied.
    ragged = spark.createDataFrame(
        [(1, [0, 1], 1.0), (2, [0], 1.0)],
        "vec_id long, _codes array<int>, _norm double",
    )
    with pytest.raises(Exception, match="codes per vector"):
        pq_code_stats(books, ragged).collect()
    # EMPTY code arrays must not silently vanish (posexplode would
    # drop the row and the remaining subspaces still balance — the
    # r11 review gap): the outer explode surfaces them as a null bin
    empty = spark.createDataFrame(
        [(1, [0, 1], 1.0), (2, [], 1.0)],
        "vec_id long, _codes array<int>, _norm double",
    )
    with pytest.raises(Exception, match="empty or null _codes"):
        pq_code_stats(books, empty).collect()


def test_rebuild_swap_raw_matches_graded_stats(spark):
    """The r11 maintenance-only twin must time the SAME maintenance
    outcome the graded row audits: the post-swap cell stats are
    row-for-row equal to emb_index_rebuild_swap's stats columns
    (identical deterministic retrain over the identical grown
    corpus)."""
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        emb_index_rebuild_swap,
        emb_index_rebuild_swap_raw,
    )

    raw = emb_index_rebuild_swap_raw(spark, SF_DIR).localCheckpoint()
    graded = emb_index_rebuild_swap(spark, SF_DIR).select(
        "cid", "n", "frac", "skew"
    )
    assert raw.exceptAll(graded).count() == 0
    assert graded.exceptAll(raw).count() == 0


def test_pq_rebuild_swap_raw_matches_fresh_search(spark):
    """The PQ maintenance-only twin's ADC search of the swapped index
    equals a fresh-build search over the same grown corpus (the
    graded row's swap_equals_fresh contract, checked from the
    outside)."""
    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_build_index,
        pq_topk_vs_index,
    )
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        emb_pq_rebuild_swap_raw,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    raw = emb_pq_rebuild_swap_raw(spark, SF_DIR).localCheckpoint()
    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "embedding")
    u0 = (
        a.orderBy("vec_id").limit(1)
        .select(F.col("embedding").alias("_e0"))
    )
    b = (
        emb.filter(F.col("vec_id") % 12 == 2)
        .select("vec_id")
        .crossJoin(F.broadcast(u0))
        .select("vec_id", F.col("_e0").alias("embedding"))
    )
    union = a.unionByName(b)
    books, codes = pq_build_index(union, m=8, ksub=64)
    queries = emb.filter(F.col("vec_id") % 50 == 1)
    rerank = max(10, union.count() // 50)
    want = pq_topk_vs_index(
        books, codes, union, queries, k=5, rerank=rerank
    )
    assert raw.exceptAll(want).count() == 0
    assert want.exceptAll(raw).count() == 0


def test_pq_code_stats_rejects_empty_codes_relation(spark):
    """A zero-row codes relation (emptied or mis-addressed store)
    fails with the contract's diagnosis instead of returning empty
    stats that crash callers' max(skew) gates (r11 review)."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.similarity import (
        pq_code_stats,
    )

    books = spark.createDataFrame(
        [(j, c, [float(j), float(c)]) for j in range(2) for c in range(4)],
        "j int, c int, centroid array<double>",
    )
    none = spark.createDataFrame(
        [], "vec_id long, _codes array<int>, _norm double"
    )
    with pytest.raises(ValueError, match="empty codes relation"):
        pq_code_stats(books, none)
