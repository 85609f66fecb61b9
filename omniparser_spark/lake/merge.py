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
transform), full-outer-joins *only those buckets* with the deduped
batch, and rewrites only them (COW). The join key is also the bucket
key, so both sides hash-partition on the same function; AQE picks
broadcast for small micro-batches automatically.
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
) -> dict[str, Any] | None:
    """Apply one LWW-deduped micro-batch. Returns merge stats, or None
    if the batch was fenced off as already committed.

    `batch` columns: keys + (offset, op) + any subset of the table's
    data columns (missing ones are NULL-filled — additive evolution).
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

    # persist: the deduped batch is consumed twice (stats aggregate +
    # merge join) and its LWW shuffle must not recompute per action
    batch = batch.withColumn("_bucket", bucket_expr(key_col, n_buckets)).persist()

    # one driver action for bucket pruning + fence bookkeeping + count
    stats_row = batch.agg(
        F.collect_set("_bucket").alias("buckets"),
        F.max("offset").alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    touched = sorted(int(b) for b in (stats_row["buckets"] or []))
    target = table.read(buckets=touched, include_hidden=True)
    if "_last_offset" not in target.columns:
        target = target.withColumn("_last_offset", F.lit(-1).cast("long"))

    if "_deleted" not in target.columns:
        target = target.withColumn("_deleted", F.lit(False))

    t = target.select(
        *[F.col(k).alias(f"_t_{k}") for k in keys],
        *[F.col(c).alias(f"_t_{c}") for c in data_cols],
        F.col("_last_offset").alias("_t_last_offset"),
        F.col("_deleted").alias("_t_deleted"),
    )
    s = batch.select(
        *keys,
        *[F.col(c).alias(f"_s_{c}") for c in data_cols],
        F.col("offset").alias("_s_offset"),
        F.col("op").alias("_s_op"),
    )
    cond = [s[k] == t[f"_t_{k}"] for k in keys]
    j = s.join(t, cond, "full_outer")

    matched = j[f"_t_{keys[0]}"].isNotNull() & j["_s_offset"].isNotNull()
    s_only = j[f"_t_{keys[0]}"].isNull()
    # LWW fence: the event wins iff it is strictly newer in the total
    # order (ts, offset). Equal (ts, offset) = the same event
    # re-delivered -> no-op (idempotency at row granularity).
    fence_pass = F.struct(j["_s_ts"], j["_s_offset"]) > F.struct(
        j["_t_ts"], j["_t_last_offset"]
    )
    is_delete = j["_s_op"] == "D"

    take_source = (matched & fence_pass) | s_only

    out_cols = []
    for k in keys:
        out_cols.append(
            F.when(take_source, j[k]).otherwise(j[f"_t_{k}"]).alias(k)
        )
    for c in data_cols:
        out_cols.append(
            F.when(take_source, j[f"_s_{c}"]).otherwise(j[f"_t_{c}"]).alias(c)
        )
    out_cols.append(
        F.when(take_source, j["_s_offset"])
        .otherwise(j["_t_last_offset"])
        .cast("long")
        .alias("_last_offset")
    )
    # deletes become tombstones (hidden row, filtered on read) so that a
    # later-arriving *older* event for the same key cannot resurrect it
    out_cols.append(
        F.when(take_source, is_delete).otherwise(j["_t_deleted"]).alias("_deleted")
    )

    merged = j.select(*out_cols)
    merged = merged.withColumn("_bucket", bucket_expr(key_col, n_buckets))

    try:
        snap = table.commit(
            merged,
            touched_buckets=touched,
            summary_updates={
                "batch_id": batch_id,
                "max_offset_applied": max(
                    int(summary.get("max_offset_applied", -1)),
                    int(stats_row["mx"] if stats_row["mx"] is not None else -1),
                ),
            },
        )
    finally:
        batch.unpersist()
    return {
        "batch_id": batch_id,
        "snapshot_version": snap.version,
        "touched_buckets": touched,
        "batch_rows": int(stats_row["n"]),
    }
