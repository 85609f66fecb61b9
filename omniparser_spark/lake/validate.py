"""Cross-table equality validation: the shadow-run / migration gate.

The north rule's acceptance test is final-state equality — "per-turn
text equality under stable (conv_id, turn_idx) ordering" against the
reference replay. Real deployments need that check as an OPERATOR,
not just an offline gate: a team migrating engines (or changing a
merge rule, or re-bucketing, or switching COW->MOR) shadow-runs the
new pipeline next to the old one and diffs the two tables before
cutting over. This module is that diff.

Shape: one full outer join on the merge keys + column-wise compare —
both sides hash-partition on the same keys, so co-located tables
(same bucket count) shuffle only to align, and the diff itself is
scan-bound. Nothing is collected; the report is a DataFrame the
caller can count, filter, or sink.

NULL semantics: NULL == NULL compares equal (eqNullSafe) — a column
both engines left NULL is agreement, not a diff.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omniparser_spark.lake.table import LakeTable


def diff_frames(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two frames on `keys`.

    Returns one row per key present in either side with a disagreement:
    (keys..., status, diff_cols) where status is ``only_a`` /
    ``only_b`` / ``differs`` and diff_cols names the disagreeing
    columns (empty for presence mismatches). Keys that agree on every
    compared column emit nothing — the report of a clean shadow run is
    an EMPTY frame, checked with one count.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in keys]
    compare_cols = list(compare_cols)
    # a compare column absent from b is a schema divergence — exactly
    # what a shadow-run cutover gate exists to catch. Silently skipping
    # it (the old behavior) let a migration that dropped or renamed a
    # column pass as 'equal' with no signal (ADVICE r6).
    missing = [c for c in compare_cols if c not in b.columns]
    if missing:
        raise ValueError(
            f"compare columns missing from frame b: {missing}; "
            "schema divergence must fail the gate, not pass silently"
        )

    la = a.select(
        *keys,
        F.lit(True).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
    )
    lb = b.select(
        *keys,
        F.lit(True).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
    )
    j = la.join(lb, on=keys, how="full_outer")
    diff_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("_in_b").isNull(), F.lit("only_a"))
        .when(F.col("_in_a").isNull(), F.lit("only_b"))
        .when(F.size(diff_cols) > 0, F.lit("differs"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            F.when(
                F.col("status") == "differs", diff_cols
            ).otherwise(F.array().cast("array<string>")).alias("diff_cols"),
        )
    )


def diff_tables(
    a: LakeTable,
    b: LakeTable,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two lake tables on their (shared) merge keys. The common
    shadow-run gate: ``diff_tables(old, new).count() == 0`` before
    cutover. Versions/tags travel through ``LakeTable.read`` — pass
    pre-read frames to :func:`diff_frames` for time-travel diffs."""
    ka = tuple(a.summary().get("merge_keys") or ())
    kb = tuple(b.summary().get("merge_keys") or ())
    if ka != kb:
        raise ValueError(f"merge keys differ: {ka} vs {kb}")
    return diff_frames(a.read(), b.read(), ka, compare_cols)


def equality_report(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> dict:
    """One-line summary of a shadow diff: row counts per side + diff
    counts per status. Two counts + one small aggregate — the
    cutover-gate numbers a migration runbook records."""
    d = diff_frames(a, b, keys, compare_cols).groupBy("status").count()
    by = {r["status"]: r["count"] for r in d.collect()}
    return {
        "rows_a": a.count(),
        "rows_b": b.count(),
        "only_a": int(by.get("only_a", 0)),
        "only_b": int(by.get("only_b", 0)),
        "differs": int(by.get("differs", 0)),
        "equal": not by,
    }
