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

import numpy as np
import pandas as pd
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


def _quantize(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    scale: int,
    out_id: str | None = None,
) -> DataFrame:
    """Shared integer-grid quantization (``floor(v * scale)`` per dim
    as columns `_e0.._e{dim-1}`).  kmeans_lloyd and semantic_dedup MUST
    use the identical expression — the dedup's norms/dots only line up
    with the cluster assignment (and with the unrolled SQL oracles)
    because both sit on the same grid.  float32 -> double happens
    BEFORE scaling: engines disagree on float*int promotion, but
    double math is IEEE-identical."""
    idc = F.col(id_col)
    return vecs.select(
        idc.alias(out_id) if out_id else idc,
        *[
            F.floor(F.col(vec_col)[d].cast("double") * scale)
            .cast("long")
            .alias(f"_e{d}")
            for d in range(dim)
        ],
    )


def kmeans_lloyd(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Lloyd k-means over an embedding column, engineered so the
    distributed result is BIT-IDENTICAL to a sequential replay — the
    semantic-clustering primitive for corpus curation (cluster-balanced
    sampling, SemDeDup-style prototype dedup, topic bucketing).

    Returns (id, cluster) after `iters` full assignment+update rounds.

    Determinism engineering (the hard part of cross-engine ML):
    - vectors are quantized ONCE to an integer grid
      (``floor(v * scale)``): centroid updates are exact BIGINT sums
      divided by exact counts, so every engine computes the same IEEE
      doubles — no float accumulation-order divergence;
    - init centroids are the k rows with the smallest md5(id) (a
      deterministic pseudorandom draw, same device as the sampling
      operators) — no seed-dependent RNG;
    - assignment evaluates squared distances with a FIXED per-dim
      summation order and breaks argmin ties toward the lower cluster
      index.

    Scale shape: the assignment pass is a narrow map with the k
    centroids baked into the expression (no join, no shuffle); the
    update pass is one map-side-combinable aggregate collecting
    k x (dim+1) scalars to the driver — the same driver-state bound as
    the IVF coarse quantizer.  Cost per iteration is one scan; `iters`
    is explicit (fixed-round, like `exact_rounds` propagation) so the
    job's cost is known a priori rather than convergence-dependent.
    """
    q = _quantize(vecs, id_col, vec_col, dim, scale, out_id="_id")
    q = q.persist()

    def _assign(frame: DataFrame) -> DataFrame:
        # score_j = |c_j|^2 - 2 x.c_j  (= dist_j - |x|^2): same argmin
        # as squared distance.  |c|^2 is driver-computed in exact
        # arithmetic (python ints for integer centroids, the same
        # left-assoc double sum as the oracle for updated ones).
        #
        # Evaluated as a VECTORIZED Arrow batch (numpy), not a k x dim
        # JVM expression tree: that tree exceeds the whole-stage-codegen
        # method limit ("Whole-stage codegen disabled for plan" at
        # k=8 x dim=64) and falls back to row-at-a-time interpreted
        # eval.  numpy applies the SAME left-associative per-dim chain
        # elementwise — int64 arithmetic for integer centroids (exact,
        # same wrap semantics as the JVM long path), IEEE float64 for
        # updated ones — and takes the FIRST index of the per-row min
        # (np.argmin), which is exactly the array_position tie-break
        # the oracle's (dist, cl) order uses.  Bit-identical results,
        # ~vector speed per guide §4.2.
        all_int = all(
            isinstance(v, int) and not isinstance(v, bool)
            for c in cents
            for v in c
        )
        c2s = []
        for c in cents:
            c2 = 0
            for v in c:
                c2 = c2 + v * v  # left-assoc, matches the oracle's order
            c2s.append(c2)
        muls = [[2 * v for v in c] for c in cents]
        dtype = np.int64 if all_int else np.float64

        @F.pandas_udf("int")
        def _argmin(cols: pd.DataFrame) -> pd.Series:
            mask = cols.isna().any(axis=1).to_numpy()
            out = np.empty(len(cols), dtype=object)
            out[mask] = None  # any NULL dim -> NULL cluster (as before)
            if (~mask).any():
                x = cols[~mask].to_numpy(dtype=dtype)
                scores = np.empty((x.shape[0], len(cents)), dtype=dtype)
                for j in range(len(cents)):
                    acc = np.full(x.shape[0], c2s[j], dtype=dtype)
                    for d in range(dim):
                        acc = acc - x[:, d] * muls[j][d]
                    scores[:, j] = acc
                out[~mask] = list(np.argmin(scores, axis=1).tolist())
            return pd.Series(out)

        return frame.withColumn(
            "cluster",
            _argmin(F.struct(*[F.col(f"_e{d}") for d in range(dim)])),
        )

    try:
        init = (
            q.withColumn("_h", F.md5(F.col("_id").cast("string")))
            .orderBy("_h", "_id")
            .limit(k)
            .collect()
        )
        if len(init) < k:
            raise ValueError(
                f"need at least k={k} vectors, got {len(init)}"
            )
        cents = [[r[f"_e{d}"] for d in range(dim)] for r in init]
        for _ in range(iters - 1):
            a = _assign(q)
            stats = {
                r["cluster"]: r
                for r in a.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(f"_e{d}").alias(f"s{d}") for d in range(dim)],
                )
                .collect()
            }
            cents = [
                [
                    float(stats[j][f"s{d}"]) / stats[j]["n"]
                    if j in stats
                    else float(cents[j][d])
                    for d in range(dim)
                ]
                for j in range(k)
            ]
    finally:
        # the cache only serves the driver-side init + update jobs
        # above; the returned (lazy) assignment recomputes the cheap
        # quantization scan rather than pinning a cached frame in
        # executor storage for the session's lifetime
        q.unpersist()

    return _assign(q).select(F.col("_id").alias(id_col), "cluster")


def semantic_dedup(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    tau2_num: int = 4,
    tau2_den: int = 25,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embeddings
    with :func:`kmeans_lloyd`, then within each cluster DROP every row
    that has a lower-id neighbor with cosine similarity above
    sqrt(tau2_num / tau2_den) (default 0.4).  Returns
    (id, cluster, kept) — callers filter `kept` to materialize the
    deduplicated corpus, or keep the flag for audit.

    The threshold test is EXACT integer arithmetic on the quantized
    grid: cos(a,b) > tau  <=>  dot > 0 AND dot^2 * tau2_den >
    tau2_num * |a|^2 * |b|^2 — no float comparisons, so the
    distributed result is bit-identical to a sequential replay.

    Scale shape: pairwise comparison happens ONLY within a cluster
    (one equi-join shuffle on the cluster id).  Within-cluster cost is
    quadratic — that is SemDeDup's documented trade, and `k` is the
    knob: clusters of ~n/k rows bound each join partition; raise k
    until the per-cluster quadratic fits (the paper runs k in the tens
    of thousands at web scale).  The keep rule (no lower-id similar
    neighbor) is deliberately non-transitive: one pass, no iteration,
    deterministic under any partitioning."""
    asg = kmeans_lloyd(
        vecs, k=k, iters=iters, dim=dim, id_col=id_col,
        vec_col=vec_col, scale=scale,
    )
    q = _quantize(vecs, id_col, vec_col, dim, scale)
    # overflow guard: the threshold comparison computes
    # dot^2 * tau2_den and tau2_num * |a|^2 * |b|^2 in BIGINT.  With a
    # max absolute component A, both are bounded by
    # max(tau2_den, tau2_num) * (dim * A^2)^2; past 2^63 Spark (ANSI
    # off) silently wraps while the SQL oracle errors — a data-
    # dependent divergence from the bit-identical contract.  One cheap
    # aggregate checks the bound and fails loudly; callers lower
    # `scale` for large-norm embeddings.
    max_abs = q.agg(
        F.max(F.greatest(*[F.abs(F.col(f"_e{d}")) for d in range(dim)]))
    ).collect()[0][0]
    if max_abs:
        bound = max(tau2_den, tau2_num) * (dim * int(max_abs) ** 2) ** 2
        if bound >= 2**63:
            raise ValueError(
                f"semantic_dedup integer threshold would overflow: max "
                f"|component| {max_abs} at scale={scale} (bound "
                f"{bound:.2e} >= 2^63) — lower `scale`"
            )
    norm2 = None
    for d in range(dim):
        t = F.col(f"_e{d}") * F.col(f"_e{d}")
        norm2 = t if norm2 is None else norm2 + t
    z = q.withColumn("_n2", norm2).join(asg, id_col)

    # spread the PROBE side over the cluster: z inherits the (tiny)
    # embedding scan's partitioning — often a single split — and the
    # broadcast join below does all its quadratic probe work on the
    # probe side's partitions.  A keyless round-robin repartition costs
    # one exchange of the O(n) quantized rows and buys full-width
    # parallelism for the O(n^2/k) pair evaluation.
    n_parts = max(
        vecs.sparkSession.sparkContext.defaultParallelism, 8
    )
    a, b = z.repartition(n_parts).alias("a"), z.alias("b")
    dot = None
    for d in range(dim):
        t = F.col(f"a._e{d}") * F.col(f"b._e{d}")
        dot = t if dot is None else dot + t
    # BROADCAST the build side: the only equi-key is `cluster`, whose k
    # distinct values would otherwise hash the shuffle join onto k
    # partitions (k=8 on 32 cores = 4x idle + per-cluster skew — the
    # measured straggler in the 20k x 64-dim bench shape).  Broadcasting
    # keeps the quadratic probe work distributed over ALL of the
    # streaming side's partitions; the build side is one row per vector
    # (quantized dims + norm + cluster), far under the broadcast cap for
    # any k-bounded cluster shape this operator is sized for (at true
    # web scale SemDeDup shards by cluster first — k in the tens of
    # thousands — and the per-cluster frames broadcast all the same).
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"b.{id_col}").alias("_drop_id"),
        dot.alias("_dot"),
        F.col("a._n2").alias("_na2"),
        F.col("b._n2").alias("_nb2"),
    )
    drops = (
        pairs.filter(
            (F.col("_dot") > 0)
            & (
                F.col("_dot") * F.col("_dot") * tau2_den
                > tau2_num * F.col("_na2") * F.col("_nb2")
            )
        )
        .select(F.col("_drop_id").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        z.select(id_col, "cluster")
        .join(drops, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )
