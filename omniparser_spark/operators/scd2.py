"""SCD Type-2 history tables from a CDC change feed.

The classic warehouse shape for "what did this row look like at time
T?": instead of overwriting a key's row (type 1 / the LWW MERGE), each
change APPENDS a version with a validity interval — ``valid_from`` =
the change's event time, ``valid_to`` = the next change's event time
(NULL while current), plus ``is_current`` and a dense
``version_number``. Point-in-time joins then pick the version whose
interval covers the fact's timestamp.

This is the natural second consumer of the engine's change feed: the
LWW MERGE maintains the CURRENT state table; :func:`scd2_from_changes`
maintains the HISTORY table from the same events (Debezium's
"audit/history sink" pattern).

Semantics (matching the LWW order the engine fences on):
- changes for a key order by (ts, offset); exact duplicates of the
  same event (re-deliveries: same offset) collapse to one version
  BEFORE windowing, so the history is idempotent under replay;
- a delete (op='D') closes the previous interval and opens a
  TOMBSTONE version (``is_deleted=true``) — the key's history shows
  when it did not exist; a later re-insert opens a fresh version;
- ``valid_to`` is the NEXT version's valid_from (half-open intervals:
  [from, to)), NULL for the current version.

Scale shape: one dropDuplicates + one lead/row_number window family,
all partitioned by the key — a single hash shuffle of the change
stream, no global sort, no joins. At 10^10 events the history table
is append-heavy but the build is one pass.

:func:`scd2_lookup` is the point-in-time read: an interval predicate
join (key equality + from <= t < to), which Spark executes as a hash
join on the key with the interval filter applied post-match — O(fact
rows x versions-per-key), never a cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    offset_col: str = "offset",
    op_col: str = "op",
) -> DataFrame:
    """Build the SCD2 history table from canonical change rows
    (keys + data columns + ts/offset/op).

    Returns every input data column plus ``version_number`` (1-based
    per key, in (ts, offset) order), ``valid_from``, ``valid_to``
    (NULL = current), ``is_current`` and ``is_deleted``.
    """
    kcols = list(keys)
    w = Window.partitionBy(*kcols).orderBy(
        F.col(ts_col), F.col(offset_col)
    )
    data_cols = [
        c
        for c in changes.columns
        if c not in kcols and c not in (op_col,)
    ]
    versions = (
        changes
        # re-delivered events (same key + offset) are the same change:
        # exactly-once history under at-least-once delivery
        .dropDuplicates([*kcols, offset_col])
        .select(
            *kcols,
            *data_cols,
            (F.col(op_col) == "D").alias("is_deleted"),
        )
    )
    return versions.select(
        *kcols,
        *[c for c in data_cols if c != ts_col],
        "is_deleted",
        F.row_number().over(w).cast("int").alias("version_number"),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w).isNull().alias("is_current"),
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    at_col: str = "at_ts",
) -> DataFrame:
    """Point-in-time join: for each fact row, attach the history
    version whose [valid_from, valid_to) interval covers the fact's
    timestamp. Facts before a key's first version (or targeting a
    deleted interval's tombstone) keep the tombstone/NULL semantics
    of the matched version; facts matching nothing drop (inner join —
    use a left join on the result if absence matters).

    Plan: equi-join on the keys (hash join, broadcastable when the
    history's key slice is small) with the interval predicate as a
    post-match filter — never a range cross product. History keys are
    renamed before the join so facts derived from the same lineage as
    the history (the common case: both come from one change feed)
    cannot collapse into ambiguous/trivially-true predicates.
    """
    h = history
    for k in keys:
        h = h.withColumnRenamed(k, f"_h_{k}")
    cond = None
    for k in keys:
        c = facts[k] == h[f"_h_{k}"]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (facts[at_col] >= h["valid_from"])
        & (h["valid_to"].isNull() | (facts[at_col] < h["valid_to"]))
    )
    return facts.join(h, cond, "inner").drop(
        *[f"_h_{k}" for k in keys]
    )
