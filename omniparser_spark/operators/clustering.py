"""Near-duplicate cluster assembly: connected components over candidate
pairs + canonical-representative selection.

The dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-LSH — operators/dedup_text.py, similarity.py) produces
*pairs*; an actual corpus dedup needs the transitive closure of those
pairs (A~B, B~C => one cluster) and one kept document per cluster. The
reference has no counterpart (it is a parser, not a corpus tool); this
is a north-rule training-data-pipeline operator.

Algorithm: iterative min-label propagation over the undirected pair
graph — each round every node takes the minimum label among itself and
its neighbors; converges in O(cluster diameter) rounds. Near-dup
clusters are shallow (diameter a handful at worst: boilerplate families
link through shared templates), so the round count is small and
bounded; each round is one join + one map-side-combinable min
aggregate, and `localCheckpoint` truncates the lineage so plan size
stays O(1) per round instead of O(rounds). This is the same shape
GraphFrames' connectedComponents uses (alternating-star variants
improve the worst-case round count to O(log n) but cost extra shuffles
per round — the wrong trade for shallow dedup graphs; the
`max_rounds` cap + convergence check make the worst case explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
    exact_rounds: int | None = None,
) -> DataFrame:
    """Components of the undirected graph given by `pairs` rows.

    Returns (id, component) for every id appearing in any pair, where
    `component` is the minimum id reachable from it. Raises if
    `max_rounds` is exhausted before convergence (a dedup pair graph
    with diameter > max_rounds means the candidate generator is linking
    everything to everything — fix the threshold/df-cap upstream).

    `exact_rounds`: run exactly that many propagation rounds with NO
    per-round convergence-count job and no convergence guarantee —
    the benchmarking hook (bench.py times the engine work of the
    iterative path without the driver-latency-bound convergence
    control), also usable when the graph's diameter is known a priori.
    """
    a, b = F.col(id_a), F.col(id_b)
    # symmetric edge list (each undirected pair once per direction)
    edges = (
        pairs.select(a.alias("u"), b.alias("v"))
        .unionByName(pairs.select(b.alias("u"), a.alias("v")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(exact_rounds if exact_rounds is not None else max_rounds):
        # min label among each node's neighbors, one shuffle with
        # map-side partial min
        nbr_min = (
            edges.join(
                labels.withColumnRenamed("id", "v"), on="v"
            )
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_component"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        )
        if exact_rounds is not None:
            labels = new_labels.drop("_changed")
            continue
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    if exact_rounds is not None:
        return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "candidate pair graph is pathologically deep; tighten the "
        "candidate threshold or df-cap upstream"
    )


def assign_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Full cluster assignment for a corpus: every row of `df` gets a
    `cluster_id` — the component's minimum doc id, or its own id for
    documents in no candidate pair (singletons; the common case, so the
    component join is against the much smaller paired-node set)."""
    comp = connected_components(pairs, id_a, id_b, max_rounds)
    return df.join(
        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def keep_canonical(
    assigned: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    prefer_longest: str | None = "text",
) -> DataFrame:
    """One representative per cluster: the longest `prefer_longest`
    value (ties -> lowest id), or the lowest id when None. One
    map-side-combinable max_by aggregate — no window sort."""
    if prefer_longest is not None:
        order = F.struct(
            F.length(F.col(prefer_longest)).alias("len"),
            (-F.col(id_col)).alias("neg_id"),
        )
    else:
        order = F.struct((-F.col(id_col)).alias("neg_id"))
    cols = [c for c in assigned.columns if c != cluster_col]
    payload = F.struct(*cols)
    return (
        assigned.groupBy(cluster_col)
        .agg(F.max_by(payload, order).alias("_w"))
        .select(cluster_col, *[F.col(f"_w.{c}").alias(c) for c in cols])
    )
