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


def hyperplane_signature(
    vec: Column, dim: int, n_bits: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(<v, r_i>).

    Hyperplane components are deterministic pseudo-gaussians derived
    from (seed, bit, dim-index) via an md5-based uniform -> Box-Muller
    is overkill; uniform in [-1,1) preserves the cosine-LSH property
    for sign tests. Constants are baked into the plan as literals —
    no broadcast needed for dims x bits in the hundreds.
    """

    def comp(bit: int, j: int) -> float:
        import hashlib

        h = hashlib.md5(f"{seed}:{bit}:{j}".encode()).hexdigest()
        return (int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0

    bits = []
    for b in range(n_bits):
        plane = F.array(*[F.lit(comp(b, j)) for j in range(dim)])
        proj = _dot(vec.cast("array<double>"), plane)
        bits.append(
            F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for e in bits[1:]:
        out = out + e
    return out


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
) -> DataFrame:
    """Approximate top-k: candidates from any-table bucket collision,
    exact cosine re-rank of candidates only.

    ``multiprobe=1`` additionally probes, per table, every bucket at
    Hamming distance 1 from the query's signature (bit flips on the
    query side only — the big corpus side stays one row per table).
    This is the standard multiprobe-LSH recall boost: with per-bit
    disagreement prob q = theta/pi, per-table hit prob rises from
    (1-q)^b to (1-q)^b + b*q*(1-q)^(b-1)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )

    def with_buckets(df: DataFrame, vcol: str, probe: bool) -> DataFrame:
        sigs = [
            hyperplane_signature(F.col(vcol), dim, n_bits, seed=1000 + t)
            for t in range(n_tables)
        ]
        rows = []
        for t, sig in enumerate(sigs):
            rows.append(F.struct(F.lit(t).alias("t"), sig.alias("b")))
            if probe and multiprobe >= 1:
                for bit in range(n_bits):
                    rows.append(
                        F.struct(
                            F.lit(t).alias("t"),
                            sig.bitwiseXOR(F.lit(1 << bit)).alias("b"),
                        )
                    )
        exploded = F.explode(F.array(*rows)).alias("tb")
        return df.select("*", exploded).select(
            *df.columns,
            F.col("tb.t").alias("table_idx"),
            F.col("tb.b").alias("bucket"),
        )

    cb = with_buckets(c, "cvec", probe=False)
    qb = with_buckets(q, "qvec", probe=True)
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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join +
    exact verification (id_a < id_b)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    bucketed = base.select(
        "*",
        F.posexplode(
            F.array(*[
                hyperplane_signature(F.col("vec"), dim, n_bits, seed=2000 + t)
                for t in range(n_tables)
            ])
        ).alias("table_idx", "bucket"),
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
