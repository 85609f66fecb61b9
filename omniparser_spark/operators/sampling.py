"""Deterministic sampling for training-data mixture construction.

Training pipelines need reproducible subsets: the same corpus + the
same config must yield byte-identical mixtures on any cluster size, any
partitioning, any engine — which rules out `rand()`/`TABLESAMPLE`
(partition-dependent) in favor of content-hash thresholds. Both
operators are pure column expressions: shuffle-free row filters (plus
one bounded per-group window for the stratified variant), scan-bound at
100 TB, and reproducible in SQL for oracle checks.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5 prefix -> uniform [0, 1): 2^24 buckets is plenty of resolution
# and stays exact in a double
_DENOM = float(1 << 24)


def hash_unit_interval(key: Column | str) -> Column:
    """Deterministic uniform [0,1) from a key's md5 — the reproducible
    substitute for rand()."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10)
        .cast("double")
        / F.lit(_DENOM)
    )


def sample_fraction(
    df: DataFrame,
    fraction: float | Mapping[str, float],
    key_col: str,
    strata_col: str | None = None,
) -> DataFrame:
    """Keep each row iff hash(key) < fraction — per-stratum fractions
    when `fraction` is a mapping over `strata_col` values (a source/
    language mixture recipe; unlisted strata are dropped). Rows keep or
    drop independently of partitioning, cluster size, and row order;
    re-running on a grown corpus keeps every previously-kept row
    (hash thresholds are stable), which makes incremental mixture
    refreshes append-only."""
    u = hash_unit_interval(key_col)
    if isinstance(fraction, Mapping):
        if strata_col is None:
            raise ValueError("strata_col required for per-stratum fractions")
        thresh = F.lit(None).cast("double")
        for value, frac in sorted(fraction.items()):
            thresh = F.when(
                F.col(strata_col) == value, F.lit(float(frac))
            ).otherwise(thresh)
        return df.filter(u < thresh)
    return df.filter(u < float(fraction))


def stratified_sample_k(
    df: DataFrame,
    k: int,
    key_col: str,
    strata_col: str,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest
    hash(key) values — deterministic, order-free, and uniform within
    each stratum. One window sort bounded per stratum (the strata are
    the bounded monitoring/mixture dimensions, not an open domain)."""
    u = hash_unit_interval(key_col)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    key_col: str = "doc_id",
    n_parts: int = 64,
) -> DataFrame:
    """Deterministic per-epoch global shuffle for training export:
    every row gets (`epoch_part`, `epoch_rank`) — a pseudorandom
    permutation keyed by (epoch, key) with no global sort.

    The training loop's requirement is a DIFFERENT, REPRODUCIBLE order
    each epoch. rand() gives neither (partition- and retry-dependent);
    a global orderBy gives a single total sort at 100 TB. Instead:
    part = hash(epoch, key) mod n_parts (one shuffle), rank = per-part
    row_number over the same hash (each part sorts independently —
    bounded at ~rows/n_parts). Writing part files in rank order IS the
    shuffled epoch; `n_parts` is the output-file / parallelism knob.
    Reading part 0..n-1 in rank order visits every row exactly once in
    an order that changes with `epoch` and reproduces exactly on rerun.

    The hash is md5-based (not xxhash64) so the DuckDB oracle can
    replay the identical permutation."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(int(epoch)), F.col(key_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    part = F.pmod(h, F.lit(int(n_parts))).cast("int")
    out = df.withColumn("_h", h).withColumn("epoch_part", part)
    w = Window.partitionBy("epoch_part").orderBy(
        F.col("_h").asc(), F.col(key_col).cast("string").asc()
    )
    return (
        out.withColumn("epoch_rank", F.row_number().over(w))
        .drop("_h")
    )


def balanced_sample_sources(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    cap: int | None = None,
) -> DataFrame:
    """Source-balanced subset: exactly min(cap, smallest-stratum size)
    rows from EVERY stratum — the UniMax-style guard against head
    sources drowning tail sources in a training mixture.

    The per-stratum quota is DATA-DERIVED (one map-side-combinable
    count aggregate, |strata| rows to the driver) and the draw within
    each stratum is the deterministic smallest-hash rule of
    :func:`stratified_sample_k` — so the result is reproducible on any
    cluster and exactly balanced, not balanced-in-expectation like
    probabilistic downweighting."""
    counts = [r["n"] for r in df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n")).collect()]
    if not counts:
        return df
    k = min(counts)
    if cap is not None:
        k = min(k, cap)
    return stratified_sample_k(df, k=k, key_col=key_col,
                               strata_col=strata_col)


def range_shard_by_value(
    df: DataFrame,
    value_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic range sharding: every non-NULL-valued row gets a
    `shard` in [0, n_shards) such that shards form contiguous,
    near-equal-count ranges of `value_col` (a NULL value cannot be
    range-ordered: it passes through with a NULL shard for the caller
    to route) — the reproducible substitute for
    ``repartitionByRange``, whose boundaries come from reservoir
    SAMPLING and change run to run (unacceptable for a training-data
    export that must be re-creatable byte-for-byte).

    Two passes, no global sort: (1) one value-histogram aggregate
    (map-side combinable; requires a bounded-cardinality value domain
    — lengths, scores, dates; NOT free text) collects (value, count)
    to the driver; (2) the driver derives boundary values
    b_i = smallest v with cumulative_count(v) >= ceil(i*N/n_shards),
    and the shard index is the pure column expression
    sum_i [value > b_i] — a narrow map (the boundary value itself
    belongs to the lower shard).  Ties share a value and land in one
    shard, so a skewed value degrades shard balance — and a value
    heavy enough to span several quotas repeats as a boundary,
    leaving the skipped shard indices empty — but never breaks
    correctness or determinism."""
    hist = sorted(
        (r["v"], r["n"])
        for r in df.filter(F.col(value_col).isNotNull())  # unrankable
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(n for _, n in hist)
    boundaries = []
    cum, i = 0, 1
    it = iter(hist)
    v, n = next(it, (None, 0))
    while i < n_shards and v is not None:
        target = -(-i * total // n_shards)  # ceil(i*N/n)
        while v is not None and cum + n < target:
            cum += n
            v, n = next(it, (None, 0))
        if v is None:
            break
        boundaries.append(v)
        i += 1
    shard = F.lit(0)
    for b in boundaries:
        shard = shard + (F.col(value_col) > F.lit(b)).cast("int")
    # the when-wrap, not NULL propagation through the sum, carries the
    # NULL contract: with an empty boundary list (n_shards=1, or an
    # all-NULL column) the sum is the constant 0 and would otherwise
    # assign NULL-valued rows to shard 0
    shard = F.when(F.col(value_col).isNotNull(), shard.cast("int"))
    return df.withColumn("shard", shard)


def export_epoch(
    df: DataFrame,
    path: str,
    epoch: int,
    key_col: str = "doc_id",
    n_parts: int = 64,
) -> str:
    """Materialize one training epoch as rank-ordered parquet files:
    `part=P/` directories whose rows are laid out in `epoch_rank`
    order, so a reader that walks part 0..n-1 sequentially visits the
    whole corpus exactly once in the epoch's deterministic
    pseudorandom order (:func:`epoch_shuffle`) — the write side of the
    reproducible-epoch contract.

    One hash shuffle (repartition by epoch_part) + an in-task sort
    bounded at ~rows/n_parts; no global sort.  Re-running the export
    for the same (corpus, epoch) produces byte-identical row order."""
    out = epoch_shuffle(df, epoch, key_col=key_col, n_parts=n_parts)
    (
        out.repartition(n_parts, F.col("epoch_part"))
        .sortWithinPartitions("epoch_rank")
        .write.mode("overwrite")
        .partitionBy("epoch_part")
        .parquet(path)
    )
    return path


def temperature_sample_sources(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    temperature: float = 3.0,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled source sampling — the standard multilingual
    pretraining mix (mC4/UniMax lineage): target share of stratum i is
    ``n_i^(1/T) / sum_j n_j^(1/T)``. T=1 keeps natural proportions,
    T->inf approaches uniform; T≈3 is the common multilingual setting
    that up-weights tail sources without flattening the head.

    `budget` rows total (default: corpus size, i.e. pure reweighting);
    each stratum's integer quota is min(n_i, round(share_i * budget)),
    computed from ONE count aggregate on the driver (|strata| scalars
    — the bounded mixture dimension, same as balanced_sample_sources).
    The draw is the deterministic smallest-hash rule, so results are
    reproducible and exact, not balanced-in-expectation. A stratum
    short of its quota contributes everything it has (no oversampling
    — repeat-epoch oversampling is epoch_shuffle's job).

    Rows with a NULL stratum have no place in a source mix and are
    EXCLUDED (loudly documented rather than silently: a NULL source
    tag is an upstream data bug — route those through the quarantine
    path, not a sampler). Quotas are auditable via
    ``temperature_quotas``.
    """
    quotas = temperature_quotas(df, strata_col, temperature, budget)
    df = df.filter(F.col(strata_col).isNotNull())
    u = hash_unit_interval(key_col)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    qcol = F.lit(None).cast("long")
    for value, q in sorted(quotas.items(), key=lambda kv: str(kv[0])):
        qcol = F.when(
            F.col(strata_col) == value, F.lit(int(q))
        ).otherwise(qcol)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= qcol)
        .drop("_rk")
    )


def temperature_quotas(
    df: DataFrame,
    strata_col: str,
    temperature: float = 3.0,
    budget: int | None = None,
) -> dict:
    """The integer per-stratum quotas temperature_sample_sources
    draws: min(n_i, round(budget * n_i^(1/T) / sum n_j^(1/T))).
    Exposed separately so recipes can be audited/logged before the
    (possibly expensive) draw runs."""
    import math

    rows = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not rows:
        return {}
    inv_t = 1.0 / float(temperature)
    weights = {r[strata_col]: float(r["n"]) ** inv_t for r in rows}
    total_w = sum(weights.values())
    n_by = {r[strata_col]: int(r["n"]) for r in rows}
    b = int(budget) if budget is not None else sum(n_by.values())
    # floor(x + 0.5), NOT Python round(): round() is banker's rounding
    # and diverges from SQL round() (half away from zero) exactly at
    # .5 quotas — the engines would select different row sets
    return {
        s: min(n_by[s], int(math.floor(b * w / total_w + 0.5)))
        for s, w in weights.items()
    }
