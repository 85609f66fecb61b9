"""Column profiling: per-group data-quality stats for feed monitoring.

An ingest pipeline watches these per micro-batch / per partition-key:
row counts, null counts, min/max, exact quantiles, decimal-exact means.
The reference has no analytics operators at all; this is a north-rule
pipeline capability built purely from Spark aggregates.

Scale shape: one hash aggregation; count/min/max/sum are map-side
combinable. Exact percentiles are NOT map-side reducible (Spark's
`percentile` collects each group's values on the reducer) — correct for
bounded groups (event types, formats, source partitions: the monitoring
dimensions), and the docstring is explicit that open-domain/huge groups
should switch to `percentile_approx` (t-digest, combinable) and give up
oracle-exactness. Means go through DECIMAL so partial-aggregation order
cannot move the result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    approx: bool = False,
) -> DataFrame:
    """Per-group profile of a numeric column: n, nulls, min, max, mean
    (decimal-exact), and exact (or approx) percentiles as p<pct>
    columns."""
    v = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(v.isNull(), 1)).alias("n_null"),
        F.round(F.min(v), 6).alias("min_v"),
        F.round(F.max(v), 6).alias("max_v"),
        F.round(
            (
                F.sum(v.cast("decimal(28,6)")).cast("double")
                / F.count(v)
            ),
            6,
        ).alias("mean_v"),
    ]
    for p in percentiles:
        name = f"p{int(round(p * 100)):02d}"
        if approx:
            agg = F.percentile_approx(v, p)
        else:
            agg = F.percentile(v, F.lit(p))
        aggs.append(F.round(agg, 6).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)
