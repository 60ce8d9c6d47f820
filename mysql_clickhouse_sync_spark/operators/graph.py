"""Distributed connected components: near-dup candidate pairs ->
dedup clusters.

The dedup family (``operators/dedup.py``) emits candidate PAIRS
(MinHash-LSH, SimHash bands, exact-Jaccard threshold).  Turning pairs
into a deduplicated corpus needs one more step the reference has no
analogue for: group transitively-linked documents into clusters and
pick one keeper per cluster.  That is connected components over the
pair graph — the standard final stage of web-scale dedup pipelines
(the same shape as the alternating-algorithm family of
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14).

Implementation: iterative min-label propagation on DataFrames.

* state is a ``(id, component)`` relation, component = smallest node
  id reachable so far;
* each round joins labels onto the symmetric edge list and takes the
  per-node min of neighbor labels (two shuffles per round);
* ``localCheckpoint`` truncates the growing lineage each round —
  without it the plan doubles per iteration and the driver dies at
  ~20 rounds long before the data does;
* convergence in O(diameter) rounds.  Near-dup graphs are
  overwhelmingly tiny cliques (diameter 1-2), so 3-4 rounds is
  typical; ``max_iter`` guards pathological chains, and the
  alternating small-star/large-star optimization (O(log^2 n) rounds)
  is the documented upgrade path if a corpus ever produces one.

Scale: every round's cost is O(|edges|) shuffled on 8-byte keys; no
driver-side collection of anything graph-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
    unique_edges: bool = False,
) -> DataFrame:
    """Label every node with the smallest node id in its component.

    ``edges`` is an undirected pair list (each pair once is enough).
    ``nodes`` optionally supplies the full vertex relation (column
    ``id_col``) so isolated nodes come back as their own singleton
    component; otherwise the vertex set is derived from the edges.

    ``unique_edges=True`` skips the symmetrize-dedup shuffle: min-
    propagation is CORRECT under duplicate edges regardless (min is
    idempotent — duplicates only add redundant messages), so the
    ``distinct`` is purely a message-volume optimization for callers
    whose pair generators emit the same pair many times (multi-band
    LSH).  Callers that already emit each pair once (a groupBy'd
    Jaccard threshold, single-assignment bucket pairs) pay a full
    edge-list shuffle for nothing — at any scale.

    Returns ``(id, component)``, one row per node, deterministic.
    """
    from pyspark.sql import Observation

    # Materialize the directed edge list BEFORE symmetrizing: the
    # union's two branches would otherwise each re-evaluate the
    # (potentially expensive) candidate-pair plan feeding ``edges``.
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .localCheckpoint(eager=True)
    )
    sym = e.unionByName(
        e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    )
    if not unique_edges:
        # the dedup is a real shuffle — pin its result so each round
        # reads the deduped RDD, not the shuffle plan
        sym = sym.distinct().localCheckpoint(eager=True)
    # else: sym is a NARROW union over the pinned edge RDD — an extra
    # checkpoint would be a pure barrier job (r15; each round's join
    # re-reads the pinned e twice, which is free)

    if nodes is not None:
        vertex = nodes.select(F.col(id_col).alias("id")).distinct()
    else:
        vertex = (
            sym.select(F.col("_a").alias("id")).distinct()
        )

    def _pin_with_sum(lbl: DataFrame):
        # Labels only ever decrease (min-propagation), so the total is
        # strictly monotone: equal sums <=> converged.  The sum RIDES
        # the checkpoint materialization via Observation (r15, guide
        # §1.2/§5: the old separate .first() agg was one extra driver-
        # barrier job per round); decimal(38) keeps the sum exact at
        # any node-id magnitude.
        obs = Observation()
        pinned = lbl.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint(eager=True)
        return pinned, obs.get["s"]

    labels, prev_sum = _pin_with_sum(
        vertex.select("id", F.col("id").alias("component"))
    )
    for _ in range(max_iter):
        # neighbor messages: each edge forwards the src's current label
        msgs = (
            sym.join(labels, sym["_a"] == labels["id"])
            .select(F.col("_b").alias("id"), "component")
        )
        mins = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # POINTER JUMP (r14, guide §1.2 — fix the distributed
        # algorithm first): follow each label one hop — component <-
        # the component node's own current label.  Plain min-
        # propagation needs O(diameter) rounds (the sf0.1 semantic
        # pair graph measured EIGHTEEN — chains, not just cliques);
        # with the jump the propagation distance roughly doubles per
        # round, so convergence is O(log diameter) — the alternating-
        # algorithm idea of Kiveris et al. applied as path
        # compression.  Every component value is a vertex id (min over
        # member ids), so the self-join always finds its row; labels
        # still only ever DECREASE (the jumped label is the component
        # node's label <= its id), keeping the monotone label-sum
        # convergence test exact.
        # materialize the round's min-labels ONCE; the jump self-join
        # reads the pinned RDD twice (plan-shared lineage through the
        # union+agg subtree trips Catalyst's self-join dedup, and the
        # convergence sum reads it anyway).  NAME-based rename + join
        # (no df["col"]/alias-qualified refs): plan-id-tagged column
        # references across a checkpointed self-join trip lazy
        # resolution ("key not found" at optimization).
        mins = mins.localCheckpoint(eager=True)
        parent = mins.withColumnRenamed("id", "_pid").withColumnRenamed(
            "component", "_pc"
        )
        labels, cur_sum = _pin_with_sum(
            mins.join(parent, F.col("component") == F.col("_pid"))
            .select("id", F.col("_pc").alias("component"))
        )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def cell_components(
    cells: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    cell_col: str = "cell",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Connected components of a CELL-CONFINED pair graph in ONE
    non-iterative pass (r15, guide §8 — use what you know that the
    optimizer does not): when every edge links two members of the same
    cell (single-assignment bucket pair generators — each vector sits
    in exactly one quantizer cell and pairs are generated within
    cells), components can never span cells, so the global iterative
    label propagation (O(log d) rounds, each a join + aggregation +
    driver sync) collapses to an embarrassingly parallel per-cell
    union-find inside one ``applyInPandas`` kernel.

    ``cells`` maps every node to its cell (``id_col``, ``cell_col``).
    The cell-confinement invariant is CHECKED, not trusted: both
    endpoints' cells are joined on and any cross-cell edge fails the
    job with the real cause (an inner join would silently drop it and
    return a wrong clustering).

    Per-cell work is bounded by the pair generators' ``max_bucket``
    guard (<= 4096 members, so <= ~8M pair rows in one kernel call);
    inside the kernel the component labels converge by numpy
    min-propagation + pointer doubling over an index array — O(log
    cell) vectorized passes, no Python per-edge loop.

    Returns ``(id, component)`` for every EDGE-TOUCHED node, component
    = smallest member id — the exact :func:`connected_components`
    output contract (equality pinned in tests/test_graph.py)."""
    cmap = cells.select(
        F.col(id_col).alias("_cid_key"), F.col(cell_col).alias("_cc")
    )
    both = (
        pairs.select(F.col(pair_a).alias("_a"), F.col(pair_b).alias("_b"))
        .join(
            cmap.select(
                F.col("_cid_key").alias("_a"), F.col("_cc").alias("_ca")
            ),
            "_a",
        )
        .join(
            cmap.select(
                F.col("_cid_key").alias("_b"), F.col("_cc").alias("_cb")
            ),
            "_b",
        )
    )
    id_type = pairs.schema[pair_a].dataType.simpleString()

    def comp(key, pdf):
        import numpy as np
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame({"id": [], "component": []})
        if not (pdf["_ca"] == pdf["_cb"]).all():
            bad = pdf[pdf["_ca"] != pdf["_cb"]].iloc[0]
            raise ValueError(
                "cell_components: cross-cell edge "
                f"({bad['_a']!r} in cell {bad['_ca']!r}) — "
                f"({bad['_b']!r} in cell {bad['_cb']!r}); the pair "
                "source violates the cell-confinement invariant — use "
                "connected_components instead"
            )
        a = pdf["_a"].to_numpy()
        b = pdf["_b"].to_numpy()
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ia, ib = inv[: len(a)], inv[len(a):]
        # min-label propagation over the index array: ids is sorted
        # ascending, so the smallest INDEX in a component is its
        # smallest id.  Each pass is one vectorized scatter-min per
        # direction plus pointer doubling (L = L[L]) — O(log cell)
        # passes, every one numpy-rate over the edge arrays.
        lab = np.arange(len(ids), dtype=np.int64)
        while True:
            prev = lab.copy()
            np.minimum.at(lab, ib, lab[ia])
            np.minimum.at(lab, ia, lab[ib])
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, prev):
                break
        return pd.DataFrame({"id": ids, "component": ids[lab]})

    return both.groupBy("_ca").applyInPandas(
        comp, f"id {id_type}, component {id_type}"
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    unique_pairs: bool = False,
    cells: DataFrame | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """Full-corpus cluster assignment from candidate pairs: every row
    of ``df`` labeled with its duplicate-cluster id (smallest member)
    and a ``is_keeper`` flag.  Singletons keep themselves.

    The iteration runs ONLY over edge-touched nodes (the candidate
    graph, typically a tiny fraction of the corpus after LSH/threshold
    filtering); untouched documents join back as their own singleton
    cluster in one final pass.  Labels shuffled per round are
    O(|edges|), never O(|corpus|).  ``unique_pairs`` passes through to
    :func:`connected_components` — set it when the pair source emits
    each pair exactly once (post-groupBy Jaccard, single-assignment
    bucket pairs) to skip the symmetrize-dedup shuffle.

    ``cells`` (with ``cell_col``) activates the non-iterative
    :func:`cell_components` fast path for CELL-CONFINED pair graphs —
    pass the node→cell assignment when every pair was generated within
    one cell (the semantic-dedup family's single-assignment quantizer
    buckets); the invariant is verified inside the kernel.  Identical
    output either way (pinned in tests/test_graph.py)."""
    if cells is not None:
        cc = cell_components(
            cells, pairs, id_col=id_col, cell_col=cell_col,
            pair_a=pair_a, pair_b=pair_b,
        )
    else:
        cc = connected_components(
            pairs, src=pair_a, dst=pair_b, unique_edges=unique_pairs
        )
    return (
        df.select(F.col(id_col))
        .join(cc, df[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )
