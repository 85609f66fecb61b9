"""Connected-components dedup clustering: convergence, transitivity,
singleton assignment, canonical selection, and the divergence guard."""

from __future__ import annotations

import pytest

from omniparser_spark.operators.clustering import (
    assign_clusters,
    connected_components,
    keep_canonical,
)


def test_path_graph_converges_to_min_label(spark):
    # a 12-node path: worst-case diameter for label propagation — the
    # min label must walk the whole chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(12)}


def test_two_components_stay_separate(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_assign_clusters_keeps_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {r.doc_id: r.cluster_id for r in assign_clusters(docs, pairs).collect()}
    assert out == {0: 0, 3: 0, 5: 0, 1: 1, 2: 2, 4: 4}


def test_keep_canonical_prefers_longest_then_lowest_id(spark):
    assigned = spark.createDataFrame(
        [
            (0, "short", 0),
            (3, "the longest text", 0),
            (5, "mid text", 0),
            (1, "solo", 1),
            (7, "same len a", 2),
            (8, "same len b", 2),
        ],
        "doc_id long, text string, cluster_id long",
    )
    kept = {r.cluster_id: r.doc_id for r in keep_canonical(assigned).collect()}
    assert kept == {0: 3, 1: 1, 2: 7}  # tie in cluster 2 -> lowest id


def test_divergence_guard_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=3)


def test_exact_rounds_matches_converged_on_shallow_graph(spark):
    """The fixed-round bench hook must equal the convergent result when
    rounds >= diameter (and must not raise on non-convergence)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    conv = {
        (r.id, r.component)
        for r in connected_components(pairs).collect()
    }
    fixed = {
        (r.id, r.component)
        for r in connected_components(pairs, exact_rounds=3).collect()
    }
    assert fixed == conv
    # under-iterating is allowed (bench hook): runs without raising
    partial = connected_components(pairs, exact_rounds=1).collect()
    assert len(partial) == len(conv)


def test_kmeans_deterministic_and_partition_independent(spark):
    from pyspark.sql import functions as F

    from omniparser_spark.operators.clustering import kmeans_lloyd

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_lloyd(e.repartition(2), k=4, iters=2, dim=64).collect()
    b = kmeans_lloyd(e.repartition(13), k=4, iters=2, dim=64).collect()
    am = {r.vec_id: r.cluster for r in a}
    bm = {r.vec_id: r.cluster for r in b}
    assert am == bm  # same result under any partitioning
    assert set(am.values()) <= set(range(4))
    assert len(am) == e.count()
    # 2 iterations should actually move assignments vs the init round
    one = {
        r.vec_id: r.cluster
        for r in kmeans_lloyd(e, k=4, iters=1, dim=64).collect()
    }
    assert one != am


def test_semantic_dedup_drops_near_identical(spark):
    from pyspark.sql import functions as F

    from omniparser_spark.operators.clustering import semantic_dedup

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant an exact duplicate of vec 0 under a fresh high id: it MUST
    # be dropped (cos = 1 with its twin, same cluster by construction)
    twin = e.filter(F.col("vec_id") == 0).select(
        F.lit(10_000).alias("vec_id"), "embedding", "label"
    )
    out = semantic_dedup(
        e.unionByName(twin), k=4, iters=2, dim=64
    )
    rows = {r.vec_id: (r.cluster, r.kept) for r in out.collect()}
    assert rows[10_000][1] is False  # the twin is dropped
    assert rows[0][1] is True  # the lower-id original is kept
    assert rows[10_000][0] == rows[0][0]  # same cluster
    kept = sum(1 for _, k in rows.values() if k)
    assert 0 < kept < len(rows)
    # deterministic under repartitioning
    again = semantic_dedup(
        e.unionByName(twin).repartition(7), k=4, iters=2, dim=64
    )
    assert rows == {r.vec_id: (r.cluster, r.kept) for r in again.collect()}
