"""As-of join: match each left row to the latest right row at or
before its timestamp, per key.

The CDC-adjacent lookup every feed pipeline eventually needs (enrich
events with the dimension value *as of* the event time — price at
trade time, config at request time, user profile at turn time). Spark
has no built-in as-of join; the naive formulations die at scale:
a range-condition join explodes to O(left x right-per-key) before
filtering, and a per-left-row subquery is a correlated join. This
implementation is the union-merge pattern (the same shape Flink's
temporal join and pandas merge_asof use, lifted to a distributed
setting):

    union(left tagged 1, right tagged 0)
      -> one hash shuffle on key
      -> per-key sort by (time, tag, tiebreak)
      -> last_value(right payload, ignorenulls) over
         rowsBetween(unboundedPreceding, currentRow)
      -> keep tag==1 rows

Cost: ONE shuffle of left+right and a per-key sort — no blowup, no
range cross product. Right rows sort before left rows at equal
timestamps (tag 0 < 1), giving the standard 'at or exactly at' semantics
(DuckDB/pandas asof backward). Skew note: a hot key's group sorts in
one task; as-of needs per-key order so salting does not apply — split
pathological keys by time-range chunking upstream if one key exceeds a
task's memory (rows spill, but sort time is the bound).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of-backward join. Every `left` row is returned with
    `value_cols` from the latest `right` row whose time is <= the left
    row's time for the same key (NULL when no such row exists).

    `tiebreak`: right-side column ordering equal-timestamp right rows
    (the later one wins); REQUIRED if (key, right_time) is not unique —
    otherwise the carried value would be nondeterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]

    payload = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        # keep the tiebreak's OWN type (string/timestamp tiebreaks order
        # natively); the left side carries a NULL of the same type, so
        # unionByName never coerces the right side to string and
        # equal-timestamp winner selection stays type-correct
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tie"),
        payload.alias("_rv"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(*keys)
        # _tie only orders right rows among themselves (left rows all
        # carry NULL and sort first within their (t, tag) stratum —
        # irrelevant to their own frame result since right rows of the
        # same timestamp already precede them via _tag)
        .orderBy(F.col("_t"), F.col("_tag"), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof", F.last(F.col("_rv"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
    )
    return out
