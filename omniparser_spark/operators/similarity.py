"""Similarity search over embedding columns (array<float>).

Two paths, same contract:
- ``cosine_topk_bruteforce`` — exact top-k by cosine: broadcast the
  query set, cross-join, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side), window top-k. The baseline and the
  verifier for the approximate path.
- ``lsh_topk`` — scale path: random-hyperplane LSH buckets (SimHash on
  the embedding sign pattern); candidates = bucket collisions across
  any of `n_tables` hash tables; exact re-rank of candidates only.
  At 10^9 vectors the bucket join replaces the cross-join; recall is
  tunable by (n_tables, n_bits).

Embedding-cosine near-duplicate detection reuses the same machinery
(``embedding_near_dups``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. queries: (query_id, embedding)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("cvec"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _plane_comp(seed: int, bit: int, j: int) -> float:
    """Deterministic pseudo-gaussian hyperplane component from
    (seed, bit, dim-index) — md5-based uniform in [-1, 1); uniform
    preserves the cosine-LSH property for sign tests. Shared verbatim
    by the expression path, the pandas path, and the SQL oracles."""
    import hashlib

    h = hashlib.md5(f"{seed}:{bit}:{j}".encode()).hexdigest()
    return (int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0


def hyperplane_signature(
    vec: Column, dim: int, n_bits: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(<v, r_i>).

    Expression path: constants are baked into the plan as literals —
    fine (and oracle-reproducible in SQL) up to a few thousand
    dim x bits; for production embedding dims use the pandas path
    (:func:`with_hyperplane_signatures`), which keeps the plan O(1).
    """
    bits = []
    for b in range(n_bits):
        plane = F.array(*[F.lit(_plane_comp(seed, b, j)) for j in range(dim)])
        proj = _dot(vec.cast("array<double>"), plane)
        bits.append(
            F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for e in bits[1:]:
        out = out + e
    return out


# Above this many plan literals (dim x n_bits x n_tables) the baked
# expression tree starts to hurt Catalyst (plan size, codegen, task
# binary broadcast) — switch to the Arrow-batched matrix projection.
_EXPR_LITERAL_BUDGET = 8192


def with_hyperplane_signatures(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed_base: int,
    out_col: str = "_sigs",
    method: str = "auto",
) -> DataFrame:
    """Add `out_col`: array<long> of per-table LSH signatures.

    method='expr' builds one literal-array dot product per (table,
    bit) — whole-stage codegen, SQL-oracle-reproducible, but the plan
    carries dim x n_bits x n_tables literals (at dim=768, 12 bits,
    4 tables that's ~37k literal nodes — Catalyst plan-size blowup).
    method='pandas' multiplies each Arrow batch against the
    (dim x n_bits x n_tables) hyperplane matrix with one numpy matmul
    per batch — the scale path; the matrix is rebuilt per executor
    from the same deterministic derivation, so no broadcast is needed
    either. 'auto' picks by the literal budget.
    """
    if method == "auto":
        method = (
            "expr" if dim * n_bits * n_tables <= _EXPR_LITERAL_BUDGET else "pandas"
        )
    if method == "expr":
        sigs = F.array(
            *[
                hyperplane_signature(
                    F.col(vec_col), dim, n_bits, seed=seed_base + t
                )
                for t in range(n_tables)
            ]
        )
        return df.withColumn(out_col, sigs)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def sig_udf(v):  # pd.Series[list[float]] -> pd.Series[list[int]]
        import numpy as np
        import pandas as pd

        # plane matrix cached per worker process: a scalar pandas UDF
        # body runs once per ARROW BATCH, and rebuilding dim x bits x
        # tables md5-derived components per batch would dominate the
        # matmul at production dims (~37k md5 calls/batch at 768x12x4)
        planes = _planes_matrix(dim, n_bits, n_tables, seed_base)
        weights = np.asarray([1 << b for b in range(n_bits)], dtype=np.int64)
        x = np.asarray(v.tolist(), dtype=np.float64)  # (rows, dim)
        signs = (x @ planes) >= 0  # (rows, n_bits * n_tables)
        out = [
            [
                int(signs[i, t * n_bits : (t + 1) * n_bits] @ weights)
                for t in range(n_tables)
            ]
            for i in range(signs.shape[0])
        ]
        return pd.Series(out)

    return df.withColumn(out_col, sig_udf(F.col(vec_col).cast("array<double>")))


_PLANES_CACHE: dict = {}


def _planes_matrix(dim: int, n_bits: int, n_tables: int, seed_base: int):
    """(dim, n_bits*n_tables) hyperplane matrix, memoized per process
    (driver and each Python worker build it at most once)."""
    import numpy as np

    key = (dim, n_bits, n_tables, seed_base)
    m = _PLANES_CACHE.get(key)
    if m is None:
        m = np.empty((dim, n_bits * n_tables), dtype=np.float64)
        for t in range(n_tables):
            for b in range(n_bits):
                for j in range(dim):
                    m[j, t * n_bits + b] = _plane_comp(seed_base + t, b, j)
        _PLANES_CACHE[key] = m
    return m


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k: candidates from any-table bucket collision,
    exact cosine re-rank of candidates only.

    ``multiprobe=1`` additionally probes, per table, every bucket at
    Hamming distance 1 from the query's signature (bit flips on the
    query side only — the big corpus side stays one row per table).
    This is the standard multiprobe-LSH recall boost: with per-bit
    disagreement prob q = theta/pi, per-table hit prob rises from
    (1-q)^b to (1-q)^b + b*q*(1-q)^(b-1).

    `method` picks the signature backend (see
    :func:`with_hyperplane_signatures`): 'expr' literals at test dims,
    'pandas' matrix projection at production embedding dims."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )

    cb = (
        with_hyperplane_signatures(
            c, "cvec", dim, n_bits, n_tables, seed_base=1000, method=method
        )
        .select("vec_id", "cvec", F.posexplode("_sigs").alias("table_idx", "bucket"))
    )
    masks = [0] + ([1 << b for b in range(n_bits)] if multiprobe >= 1 else [])
    qb = (
        with_hyperplane_signatures(
            q, "qvec", dim, n_bits, n_tables, seed_base=1000, method=method
        )
        .select("query_id", "qvec", F.posexplode("_sigs").alias("table_idx", "sig"))
        .select(
            "query_id",
            "qvec",
            "table_idx",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in masks])
            ).alias("_mask"),
            F.col("sig"),
        )
        .withColumn("bucket", F.col("sig").bitwiseXOR(F.col("_mask")))
    )
    cand = (
        cb.join(F.broadcast(qb), ["table_idx", "bucket"])
        .select("query_id", "vec_id", "cvec", "qvec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("cvec"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k (inner-product coarse quantizer):

    1. **train**: centroids = the `n_lists` lowest-id corpus vectors
       (deterministic stand-in for offline k-means — the IVF structure,
       not the clustering quality, is what matters here);
    2. **assign**: every corpus vector goes to the list whose centroid
       maximizes the dot product (centroids baked as literals — the
       broadcast-table pattern; no shuffle to assign);
    3. **probe**: each query searches its `n_probe` best lists only;
    4. exact cosine re-rank of the candidate lists, window top-k.

    At 10^9 vectors the per-list equi-join replaces the brute-force
    cross join; recall is tuned by (n_lists, n_probe).
    """
    cent_rows = (
        corpus.orderBy(F.col(id_col))
        .limit(n_lists)
        .select(F.col(vec_col).cast("array<double>").alias("c"))
        .collect()
    )
    cents = [list(r["c"]) for r in cent_rows]

    def best_lists(vcol: Column, take: int) -> Column:
        # array_min over (-dot, idx) structs = argmax dot, ties -> low idx
        scored = F.array(
            *[
                F.struct(
                    (-_dot(vcol, F.array(*[F.lit(x) for x in c]))).alias("nd"),
                    F.lit(i).alias("i"),
                )
                for i, c in enumerate(cents)
            ]
        )
        return F.slice(F.array_sort(scored), 1, take)

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    c = c.withColumn(
        "list_id", best_lists(F.col("cvec"), 1).getItem(0).getField("i")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    q = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.transform(
                best_lists(F.col("qvec"), n_probe), lambda s: s.getField("i")
            )
        ).alias("list_id"),
    )
    cand = c.join(F.broadcast(q), "list_id").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("cvec"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join +
    exact verification (id_a < id_b)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    bucketed = with_hyperplane_signatures(
        base, "vec", dim, n_bits, n_tables, seed_base=2000, method=method
    ).select(
        "doc_id", "vec", F.posexplode("_sigs").alias("table_idx", "bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    order_col: str = "vec_id",
) -> DataFrame:
    """Mean-pool member embeddings per group in a FIXED member order —
    the conversation/document-group embedding used for group-level
    semantic dedup and retrieval (e.g. pool a conversation's turn
    embeddings into one vector, then run semantic_dedup on those).

    Determinism: members fold in `order_col` order (collect ->
    array_sort -> sequential zip_with fold), so the float summation
    sequence — hence the result — is identical under any partitioning
    and reproducible in SQL. Returns (group_col, n_members, n_dropped,
    pooled: array<double>).

    Ragged members: the group's dimension is the first (by order_col)
    non-NULL member's size; members with a NULL vector or a different
    size are EXCLUDED from the pool and counted in `n_dropped` instead
    of silently NULLing the pooled tail (zip_with pads the shorter
    array with NULLs — one bad member would corrupt the whole group's
    vector). `n_members` counts only pooled members; an all-bad group
    surfaces n_members=0 with a NULL pooled. Continuable-error
    posture: bad members are loud in the counts, never fatal.

    One groupBy on the group key; the fold runs inside the aggregate's
    output row — no per-element explode, no second shuffle.
    """
    member = F.struct(
        F.col(order_col).alias("_o"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # F.get (not [0]): NULL on empty under ANSI, no fault
    dim = F.size(F.get(F.filter(F.col("_all"), lambda v: v.isNotNull()), 0))
    vecs = F.filter(
        F.col("_all"), lambda v: v.isNotNull() & (F.size(v) == dim)
    )
    n_members = F.size(vecs)
    zero = F.array_repeat(F.lit(0.0), dim)
    summed = F.aggregate(
        vecs,
        zero,
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
    )
    return (
        df.groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(member)),
                lambda s: s.getField("_v"),
            ).alias("_all")
        )
        .select(
            group_col,
            n_members.cast("int").alias("n_members"),
            (F.size(F.col("_all")) - n_members)
            .cast("int")
            .alias("n_dropped"),
            F.when(
                n_members > 0,
                F.transform(summed, lambda x: x / n_members),
            ).alias("pooled"),
        )
    )
