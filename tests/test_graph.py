"""Connected-components operator: correctness vs a driver-side
union-find oracle, plus the dedup-cluster assignment contract."""

from __future__ import annotations

import random

from mysql_clickhouse_sync_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp = {}
    for i in range(n_nodes):
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def test_cc_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(120)
    ]
    want = _uf_components(n, edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n).withColumnRenamed("id", "node")
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            e, nodes=nodes, id_col="node"
        ).collect()
    }
    assert got == want


def test_cc_chain_needs_multiple_rounds(spark):
    """A path graph 0-1-2-...-9 has diameter 9: propagation must keep
    iterating until label 0 reaches the far end."""
    edges = [(i, i + 1) for i in range(9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(e).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 10


def test_dedup_clusters_keeper_contract(spark):
    """Every cluster has exactly one keeper = its smallest id;
    singletons keep themselves."""
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    rows = dedup_clusters(docs, pairs).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert set(by_cluster) == {0, 1, 2, 4, 7}
    assert sorted(r["doc_id"] for r in by_cluster[1]) == [1, 3, 5]
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["is_keeper"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid


def test_long_chain_converges_within_default_iterations(spark):
    """A 120-edge path graph (diameter 120 >> max_iter 25) must still
    resolve to one component labeled by the minimum id — possible only
    because the r14 pointer-jumping step makes convergence
    O(log diameter) instead of O(diameter)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "src long, dst long"
    )
    out = connected_components(edges)
    rows = out.collect()
    assert len(rows) == 121
    assert all(r["component"] == 0 for r in rows)


def test_pointer_jump_two_chains_distinct_components(spark):
    """Two disjoint chains keep distinct min labels under jumping."""
    e1 = [(i, i + 1) for i in range(10, 40)]
    e2 = [(i, i + 1) for i in range(100, 140)]
    edges = spark.createDataFrame(e1 + e2, "src long, dst long")
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert all(out[i] == 10 for i in range(10, 41))
    assert all(out[i] == 100 for i in range(100, 141))


def test_cell_components_matches_connected_components(spark):
    """r15 fast path: on a CELL-CONFINED pair graph (every edge inside
    one cell — the semantic family's single-assignment buckets), the
    one-pass per-cell union-find must return exactly what the
    iterative global propagation returns."""
    import random

    from mysql_clickhouse_sync_spark.operators.graph import cell_components

    rng = random.Random(7)
    # 6 cells x 40 nodes; random within-cell edges incl. chains
    cells, edges = [], []
    for c in range(6):
        ids = [c * 1000 + i for i in range(40)]
        cells += [(i, c) for i in ids]
        for i in range(len(ids) - 1):
            if rng.random() < 0.35:
                edges.append((ids[i], ids[i + 1]))          # chain bits
        for _ in range(15):
            a, b = rng.sample(ids, 2)
            edges.append((min(a, b), max(a, b)))
    cdf = spark.createDataFrame(cells, "vec_id long, cid int")
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    want = sorted(
        (r["id"], r["component"])
        for r in connected_components(
            edf, src="id_a", dst="id_b", unique_edges=False
        ).collect()
    )
    got = sorted(
        (r["id"], r["component"])
        for r in cell_components(
            cdf, edf, id_col="vec_id", cell_col="cid"
        ).collect()
    )
    assert got == want


def test_cell_components_rejects_cross_cell_edge(spark):
    """The cell-confinement invariant is VERIFIED, not trusted: a
    cross-cell edge must fail the job with the real cause, never
    silently return a wrong clustering."""
    import pytest

    from mysql_clickhouse_sync_spark.operators.graph import cell_components

    cdf = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, cid int"
    )
    edf = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    with pytest.raises(Exception, match="cell-confinement"):
        cell_components(
            cdf, edf, id_col="vec_id", cell_col="cid"
        ).collect()


def test_dedup_clusters_cells_fast_path_equals_iterative(spark):
    """dedup_clusters(cells=...) — the full-corpus contract (keeper
    flags, singleton fallthrough) is identical through the fast path."""
    docs = spark.range(4000).withColumnRenamed("id", "doc_id")
    cells = docs.selectExpr("doc_id", "CAST(doc_id % 7 AS INT) AS cell")
    # within-cell pairs only: link i to i+7 (same residue class)
    pairs = spark.createDataFrame(
        [(i, i + 7) for i in range(0, 2000, 13)], "id_a long, id_b long"
    )
    base = sorted(
        tuple(r) for r in dedup_clusters(
            docs, pairs, id_col="doc_id", unique_pairs=True
        ).collect()
    )
    fast = sorted(
        tuple(r) for r in dedup_clusters(
            docs, pairs, id_col="doc_id", unique_pairs=True,
            cells=cells, cell_col="cell",
        ).collect()
    )
    assert fast == base
