"""Idempotent MERGE INTO with monotonic offset fencing.

Semantics (the north rule's apply contract), expressed once as SQL —
the statement the engine runs verbatim when an Iceberg catalog is
configured — and implemented over :class:`LakeTable` as the
sandbox-local equivalent:

    MERGE INTO target t
    USING batch s                       -- already LWW-deduped per key
    ON  t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND (s.ts, s.offset) > (t.ts, t._last_offset)
         THEN UPDATE SET *, t._deleted = (s.op = 'D')
    WHEN NOT MATCHED
         THEN INSERT *, _deleted = (s.op = 'D')

(readers see ``WHERE NOT _deleted``). Deletes are tombstones, not
physical drops, so the LWW total order ``(ts, offset)`` stays correct
when an *older* event for a deleted key arrives in a later batch —
the final table state is invariant to how the feed is sliced into
micro-batches.

Idempotency is layered:
1. **batch fence** — a batch_id already recorded in the snapshot
   summary is skipped before any work (exactly-once across restarts /
   re-deliveries of whole micro-batches);
2. **row fence** — ``(s.ts, s.offset) > (t.ts, t._last_offset)`` makes
   replayed (equal) or out-of-order (older) events no-ops at row
   granularity.

Scale shape: the local implementation prunes the target to the buckets
the batch touches (file-level pruning via the bucket partition
transform), unions *only those buckets* with the deduped batch and
takes the per-key LWW winner with one map-side-combinable max_by
aggregate (no sort-merge join, one shuffle), then rewrites only the
touched buckets (COW), one data file per bucket.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniparser_spark.lake.table import LakeTable, bucket_expr

DEFAULT_KEYS = ("conv_id", "turn_idx")


def iceberg_merge_sql(
    target: str,
    source_view: str,
    keys: Sequence[str] = DEFAULT_KEYS,
    update_cols: Sequence[str] = ("role", "text", "tool", "ts"),
) -> str:
    """The production MERGE statement for a real Iceberg catalog."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    fence = "(struct(s.ts, s.offset) > struct(t.ts, t._last_offset))"
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    sets += ", t._last_offset = s.offset, t._deleted = (s.op = 'D')"
    ins_cols = ", ".join([*keys, *update_cols, "_last_offset", "_deleted"])
    ins_vals = ", ".join(
        [f"s.{k}" for k in keys]
        + [f"s.{c}" for c in update_cols]
        + ["s.offset", "(s.op = 'D')"]
    )
    return f"""
MERGE INTO {target} t
USING {source_view} s
ON {on}
WHEN MATCHED AND {fence} THEN UPDATE SET {sets}
WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})
""".strip()


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    batch_id: int,
    keys: Sequence[str] = DEFAULT_KEYS,
    expected_rows: int | None = None,
    max_offset: int | None = None,
    batch_rows: int | None = None,
) -> dict[str, Any] | None:
    """Apply one micro-batch (need NOT be pre-deduped: the merge's
    max_by aggregate picks the per-key LWW winner among all batch rows
    AND the existing table row in one pass). Returns merge stats, or
    None if the batch was fenced off as already committed.

    `batch` columns: keys + (offset, op) + any subset of the table's
    data columns (missing ones are NULL-filled — additive evolution).

    `expected_rows` (event count or its upper bound, known from the
    offset range / normalize pass) picks the pruning strategy without
    an extra action: a batch much larger than n_buckets statistically
    touches every bucket, so the exact distinct-buckets job is wasted
    driver latency; rewriting a bucket the batch happens to miss is
    still correct (its content is carried through the LWW union
    unchanged). Small batches (streaming tail, skew) keep exact pruning.

    `max_offset` / `batch_rows` are caller-known bookkeeping (offset
    range bound, observed event count) — passed in rather than computed
    with an extra action over the batch.
    """
    summary = table.summary()
    if batch_id <= int(summary.get("batch_id", -1)):
        return None  # exactly-once batch fence: already committed

    key_col = summary["key_col"]
    n_buckets = int(summary["n_buckets"])
    schema = table.schema()
    data_cols = [
        f.name for f in schema.fields
        if f.name not in keys and not f.name.startswith("_")
    ]

    # align batch to table schema: NULL-fill columns the batch lacks
    for f in schema.fields:
        if f.name not in batch.columns and not f.name.startswith("_"):
            batch = batch.withColumn(f.name, F.lit(None).cast(f.dataType))

    batch = batch.withColumn("_bucket", bucket_expr(key_col, n_buckets))

    prune_exact = expected_rows is None or expected_rows < 64 * n_buckets
    if prune_exact:
        # batch consumed twice (bucket distinct + merge) — cache it
        batch = batch.persist()
        touched = sorted(
            int(r["_bucket"])
            for r in batch.select("_bucket").distinct().collect()
        )
    else:
        touched = list(range(n_buckets))
    target = table.read(buckets=touched, include_hidden=True)
    if "_last_offset" not in target.columns:
        target = target.withColumn("_last_offset", F.lit(-1).cast("long"))

    if "_deleted" not in target.columns:
        target = target.withColumn("_deleted", F.lit(False))

    # MERGE as union + max_by aggregate: the fence "source wins iff
    # (s.ts, s.offset) > (t.ts, t._last_offset)" is exactly the LWW
    # winner under the total order (ts, _last_offset) with the target
    # preferred at exact ties (equal = same event re-delivered -> no-op;
    # idempotency at row granularity). One hash-shuffle with map-side
    # combine, no sort — cheaper than a full-outer sort-merge join and
    # identical semantics: per key there is at most one target row
    # (table is key-unique) and one batch row (LWW-deduped upstream).
    t = target.select(
        *keys,
        *data_cols,
        F.col("_last_offset"),
        F.col("_deleted"),
        F.lit(1).alias("_pref"),  # target wins exact (ts, offset) ties
    )
    # deletes become tombstones (hidden row, filtered on read) so that a
    # later-arriving *older* event for the same key cannot resurrect it
    s = batch.select(
        *keys,
        *data_cols,
        F.col("offset").cast("long").alias("_last_offset"),
        (F.col("op") == "D").alias("_deleted"),
        F.lit(0).alias("_pref"),
    )
    u = t.unionByName(s)
    payload = F.struct(*data_cols, "_last_offset", "_deleted")
    order = F.struct(F.col("ts"), F.col("_last_offset"), F.col("_pref"))
    merged = (
        u.groupBy(*keys)
        .agg(F.max_by(payload, order).alias("_w"))
        .select(
            *keys,
            *[F.col(f"_w.{c}").alias(c) for c in data_cols],
            F.col("_w._last_offset").alias("_last_offset"),
            F.col("_w._deleted").alias("_deleted"),
        )
    )
    # one data file per touched bucket: co-locate each bucket's rows in
    # a single partition before partitionBy, else every reduce task
    # writes a sliver into every bucket dir (tasks x buckets small
    # files; measured 1024 files/commit at 32x32)
    merged = merged.withColumn(
        "_bucket", bucket_expr(key_col, n_buckets)
    ).repartition(max(len(touched), 1), "_bucket")

    try:
        snap = table.commit(
            merged,
            touched_buckets=touched,
            summary_updates={
                "batch_id": batch_id,
                "max_offset_applied": max(
                    int(summary.get("max_offset_applied", -1)),
                    int(max_offset if max_offset is not None else -1),
                ),
            },
        )
    finally:
        if prune_exact:
            batch.unpersist()
    return {
        "batch_id": batch_id,
        "snapshot_version": snap.version,
        "touched_buckets": touched,
        "batch_rows": batch_rows,
    }
