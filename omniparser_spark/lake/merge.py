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
touched buckets (COW), one data file per bucket. Per-batch merge cost
is therefore O(touched_buckets x avg_bucket_size) — it reduces to the
batch's key footprint ONLY when n_buckets is sized so a typical batch
touches a strict subset of buckets (see merge_into's cost-model note);
a batch with more keys than ~3x n_buckets statistically touches every
bucket and the merge degenerates to a full-table COW rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniparser_spark.lake.table import (
    LakeTable,
    bucket_expr,
    fixed_shape_job,
    place_exact_buckets,
    repartition_exact_buckets,
)


def _one_shuffle_merge() -> bool:
    """The merge's LWW aggregate and its exact-bucket placement can
    share ONE shuffle: place the pre-aggregate rows by bucket salt,
    then group by (salt, _bucket, *keys) — the salt and bucket are
    functions of key_col ∈ keys, so the groups are identical, and
    Catalyst sees the placement's HashPartitioning as satisfying the
    aggregate's distribution (no second exchange). Saves a full
    shuffle write+read of the merged output per batch. Escape hatch
    for same-host A/B runs: SPARK_GRAFT_ONE_SHUFFLE_MERGE=0 restores
    the two-shuffle plan (groupBy keys, then repartition).

    Sizing note: under the one-shuffle plan the aggregate runs at
    n_buckets-way parallelism (the placement's partition count), so a
    table whose bucket count is far below the cluster's cores AND
    whose batches are large under-parallelizes the LWW combine — at
    scale n_buckets should exceed core count anyway (the bucket count
    is the write/compaction unit), and an interleaved A/B on the
    4-bucket view path measured parity, but if a small-bucket table
    must take huge batches, flip the flag (or rescale_buckets)."""
    import os

    return os.environ.get("SPARK_GRAFT_ONE_SHUFFLE_MERGE", "1") != "0"

DEFAULT_KEYS = ("conv_id", "turn_idx")


def derive_n_buckets(
    expected_table_rows: int,
    target_bucket_rows: int = 100_000,
    min_buckets: int = 8,
    max_buckets: int = 4096,
) -> int:
    """Size the bucket count from the TABLE, not the batch (the cost
    model above: per-batch merge cost ~ batch_keys x bucket_rows, so
    `target_bucket_rows` is the direct knob trading per-commit file
    count against per-batch COW cost). `expected_table_rows` may be a
    rough upper bound — total feed events works: over-bucketing only
    costs file count, under-bucketing costs merge I/O, and
    :meth:`LakeTable.rescale_buckets` fixes either online."""
    if expected_table_rows <= 0:
        return min_buckets
    b = -(-expected_table_rows // max(target_bucket_rows, 1))  # ceil
    return max(min_buckets, min(max_buckets, int(b)))


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
    keys: Sequence[str] | None = None,
    expected_rows: int | None = None,
    max_offset: int | None = None,
    prune_exact: bool | None = None,
    observe_stats: bool = True,
    stage: bool = False,
    mode: str = "cow",
    touched_buckets: Sequence[int] | None = None,
) -> dict[str, Any] | None:
    """Apply one micro-batch (need NOT be pre-deduped: the merge's
    max_by aggregate picks the per-key LWW winner among all batch rows
    AND the existing table row in one pass). Returns merge stats
    (incl. `rows_written`/`tombstones` observed on the commit write),
    or None if the batch was fenced off as already committed.

    `batch` columns: keys + (offset, op) + any subset of the table's
    data columns (missing ones are NULL-filled — additive evolution).

    `mode` selects the write strategy (Iceberg `write.merge.mode`
    parity; both produce identical reader-visible state):

    - ``"cow"`` (default, copy-on-write): read + rewrite the touched
      buckets; reads stay a plain scan. Right when batches are small
      relative to their touched buckets' content or reads dominate.
    - ``"mor"`` (merge-on-read): LWW-dedupe the batch per key and
      append it as per-bucket DELTA files via
      :meth:`LakeTable.commit_delta` — ZERO base reads, O(batch)
      writes per commit; readers resolve base+deltas until
      :meth:`LakeTable.compact_buckets` folds them. Right for
      high-frequency tailing at 10^10-event scale, where COW's
      per-batch rewrite of every touched bucket is the write
      amplification that dominates the bill. `expected_rows` /
      `prune_exact` are ignored (there is nothing to prune — the
      batch's own buckets are discovered from the written files).

    Cost model (COW): the merge reads and rewrites every *touched*
    bucket in full, so per-batch cost is O(touched_buckets x
    avg_bucket_size). Pruning to the batch's actual buckets is what
    bounds that by the batch's key footprint. For R uniformly hashed
    KEYS (not rows — a 250k-event batch over 5k hot conversations has
    R=5k) over B buckets the expected touched count is
    B(1 - exp(-R/B)): essentially all once R >~ 3B. Hence:

    - `prune_exact=None` (auto): run the exact distinct-buckets job.
      The risk is asymmetric — the job is a KEY-ONLY pass over the
      batch (column pruning reaches the scan: `_bucket` needs just the
      key column, so per-format payload decode reduces to one field),
      while skipping it forces touched=ALL, O(table) read+rewrite per
      batch; at 100 TB the insurance is orders of magnitude cheaper
      than the downside, and row counts are a bad proxy for key counts
      on hot-key CDC feeds (round-2 verdict: the old
      `expected_rows < 3B` auto rule made every default-config batch a
      full-table rewrite). The only carve-out: `expected_rows` >=
      3 x n_buckets AND the table holds at most ~4 batches of events
      (proxied by `max_offset_applied`) — bootstrap loads, where the
      full rewrite costs the same order as the batch scan, so pruning
      cannot pay for itself.
    - `prune_exact=False`: caller asserts the batch spans ~all buckets
      (e.g. uniform backfill replays) — skips the distinct job.
    - At deployment, size `n_buckets` so a steady-state batch's key
      footprint stays well under it (buckets ~ table_rows /
      target_bucket_rows, :func:`derive_n_buckets`); a B sized to the
      *table* keeps per-batch merge cost O(batch keys x bucket size),
      not O(table).

    Rewriting a bucket the batch happens to miss is still correct (its
    content is carried through the LWW union unchanged) — pruning is a
    pure cost optimization, never a correctness gate.

    `max_offset` is caller-known bookkeeping (offset range bound) —
    passed in rather than computed with an extra action.

    `stage=True` runs the merge as a write-audit-publish stage: the
    snapshot is fully written but the table head does not move until
    :meth:`LakeTable.publish`. The batch fence still reads the
    PUBLISHED head, so a crashed (never-published) stage is simply
    re-staged on re-delivery — exactly-once composes with WAP.

    `observe_stats=True` (the default) REQUIRES the commit write to be
    non-empty: a CollectMetrics node on an empty relation never fires
    and ``obs.get`` blocks forever. Callers whose batches can
    legitimately be empty (registries under full replay, view syncs
    over changelog-neutral version ranges, all-late history batches,
    foreachBatch clones) must pass ``observe_stats=False``; the batch
    fence and the commit itself work fine on empty writes.
    """
    # pin the WHOLE merge — fence check, bucket expr, target read, and
    # the final commit — to one base snapshot, so an interleaved commit
    # anywhere in the window is caught by the commit's conflict
    # validation (rebase if disjoint, ConcurrentCommitError if not)
    # instead of silently building on a stale read
    base_snap = table.current()
    summary = base_snap.summary
    if batch_id <= int(summary.get("batch_id", -1)):
        return None  # exactly-once batch fence: already committed
    if keys is None:
        # the table's declared row identity governs the upsert; tables
        # created before merge_keys existed were all written with
        # DEFAULT_KEYS, so that is the honest legacy fallback
        keys = tuple(summary.get("merge_keys") or DEFAULT_KEYS)

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

    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    if mode == "mor":
        # LWW-dedupe the batch per key (one O(batch) shuffle, same
        # max_by winner rule as the COW union — the table row is NOT
        # read; the read-time resolve supplies that comparison), then
        # co-locate per bucket so each delta commit writes one file
        # per touched bucket (second O(batch) shuffle; still zero
        # table I/O).
        payload = F.struct(
            *data_cols,
            F.col("offset").cast("long").alias("_last_offset"),
            (F.col("op") == "D").alias("_deleted"),
        )
        order = F.struct(F.col("ts"), F.col("offset").cast("long"))
        out_cols = [*data_cols, "_last_offset", "_deleted"]
        if _one_shuffle_merge():
            # place first, aggregate in place: the LWW dedupe and the
            # per-bucket placement share one shuffle (see
            # _one_shuffle_merge). `_bucket` is already on `batch`.
            placed, extra = place_exact_buckets(batch, n_buckets)
            gcols = list(dict.fromkeys([*extra, "_bucket", *keys]))
            delta = (
                placed.groupBy(*gcols)
                .agg(F.max_by(payload, order).alias("_w"))
                .select(
                    "_bucket",
                    *keys,
                    *[F.col(f"_w.{c}").alias(c) for c in out_cols],
                )
            )
        else:
            delta = (
                batch.groupBy(*keys)
                .agg(F.max_by(payload, order).alias("_w"))
                .select(
                    *keys, *[F.col(f"_w.{c}").alias(c) for c in out_cols]
                )
                .withColumn("_bucket", bucket_expr(key_col, n_buckets))
            )
            delta = repartition_exact_buckets(delta, n_buckets)
        obs = None
        if observe_stats:
            from pyspark.sql import Observation

            obs = Observation(f"merge_mor_{batch_id}")
            delta = delta.observe(
                obs,
                F.count(F.lit(1)).alias("rows_written"),
                F.count(F.when(F.col("_deleted"), 1)).alias("tombstones"),
            )
        prev_counts = {
            b: len(lst) for b, lst in base_snap.delta_dirs.items()
        }
        snap = table.commit_delta(
            delta,
            summary_updates={
                "batch_id": batch_id,
                "max_offset_applied": max(
                    int(summary.get("max_offset_applied", -1)),
                    int(max_offset if max_offset is not None else -1),
                ),
            },
            stage=stage,
            stats_upper_bound=max_offset,
            base=base_snap,
        )
        touched = sorted(
            int(b)
            for b, lst in snap.delta_dirs.items()
            if len(lst) > prev_counts.get(b, 0)
        )
        stats_row = obs.get if obs is not None else None
        return {
            "batch_id": batch_id,
            "snapshot_version": snap.version,
            "staged": stage,
            "mode": "mor",
            "touched_buckets": touched,
            "rows_written": (
                int(stats_row["rows_written"]) if stats_row else None
            ),
            "tombstones": (
                int(stats_row["tombstones"]) if stats_row else None
            ),
        }

    if touched_buckets is not None:
        # caller-known bucket footprint (HistorySink, the view syncs:
        # they already ran a key-only distinct for their OWN pruned
        # reads — re-collecting the same set here would be a second
        # full pass over the batch). A SUPERSET is sound: rewriting a
        # bucket the batch misses carries its content through the LWW
        # union unchanged (the documented prune contract); a subset
        # would lose rows, so callers must pass a cover of the batch's
        # keys.
        prune_exact = False
        touched_override = sorted({int(b) for b in touched_buckets})
    else:
        touched_override = None
    if prune_exact is None:
        # asymmetric risk: exact pruning costs O(batch); skipping it
        # costs O(table) when the batch's keys are concentrated. Only
        # skip during bootstrap (table still <= ~2 batches of events —
        # proxied by max_offset_applied, an upper bound on events
        # absorbed so far) with a uniform-looking batch, where the
        # full rewrite is inevitable AND cheap.
        # OMNIPARSER_PRUNE_MODE overrides the auto rule per deployment:
        # "always"/"never" for operators who know their feed's key
        # distribution, "legacy" = the pre-round-3 rows<3B rule (bench
        # comparisons).
        import os as _os

        # NB: named prune_mode, not mode — `mode` is this function's
        # cow/mor merge-strategy parameter
        prune_mode = _os.environ.get("OMNIPARSER_PRUNE_MODE", "auto")
        uniform_batch = (
            expected_rows is not None and expected_rows >= 3 * n_buckets
        )
        if prune_mode == "always":
            prune_exact = n_buckets > 1
        elif prune_mode == "never":
            prune_exact = False
        elif prune_mode == "legacy":
            prune_exact = not uniform_batch
        else:
            # "bootstrap" = the table holds at most ~4 batches of
            # events: rewriting it costs the same order as scanning the
            # batch, so pruning can't pay for its extra pass. Beyond
            # that the table-vs-batch ratio (and the saving) only grows.
            events_so_far = int(summary.get("max_offset_applied", -1)) + 1
            bootstrap = events_so_far <= 4 * (expected_rows or 0)
            prune_exact = n_buckets > 1 and not (uniform_batch and bootstrap)
    if prune_exact:
        # NO persist: caching the decoded batch costs more than it
        # saves (cache write + losing whole-stage codegen on the
        # InMemoryRelation read measurably beat the re-decode —
        # round-3 scaling A/B). Column pruning makes this distinct a
        # key-only pass: `_bucket` needs just the key column, so the
        # scan decodes one field, not the whole payload schema.
        with fixed_shape_job(batch.sparkSession):
            touched = sorted(
                int(r["_bucket"])
                for r in batch.select("_bucket").distinct().collect()
            )
    elif touched_override is not None:
        touched = touched_override
    else:
        touched = list(range(n_buckets))
    target = table.read(
        buckets=touched, include_hidden=True, version=base_snap.version
    )
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
    def sel(df: DataFrame, *head: str) -> DataFrame:
        """Winner projection shared by both plan shapes; `head` carries
        group-key columns (e.g. _bucket) straight through."""
        return df.select(
            *head,
            *keys,
            *[F.col(f"_w.{c}").alias(c) for c in data_cols],
            F.col("_w._last_offset").alias("_last_offset"),
            F.col("_w._deleted").alias("_deleted"),
        )
    # one data file per touched bucket: co-locate each bucket's rows in
    # a single partition before partitionBy, else every reduce task
    # writes a sliver into every bucket dir (tasks x buckets small
    # files; measured 1024 files/commit at 32x32)
    if _one_shuffle_merge():
        # place the UNION by bucket salt first, then aggregate in
        # place: LWW dedupe + placement in one shuffle (see
        # _one_shuffle_merge)
        u = u.withColumn("_bucket", bucket_expr(key_col, n_buckets))
        placed, extra = place_exact_buckets(u, touched)
        gcols = list(dict.fromkeys([*extra, "_bucket", *keys]))
        merged = sel(
            placed.groupBy(*gcols).agg(F.max_by(payload, order).alias("_w")),
            "_bucket",
        )
    else:
        merged = sel(
            u.groupBy(*keys).agg(F.max_by(payload, order).alias("_w"))
        )
        merged = repartition_exact_buckets(
            merged.withColumn("_bucket", bucket_expr(key_col, n_buckets)),
            touched,
        )

    # observe applied-row stats on the commit write itself (no extra
    # action): rows_written = post-merge row count of the touched
    # buckets (live + tombstones), tombstones = delete markers among
    # them. `observe_stats=False` for callers inside foreachBatch —
    # cloned streaming sessions never complete Observation futures.
    obs = None
    if observe_stats:
        from pyspark.sql import Observation

        obs = Observation(f"merge_{batch_id}")
        merged = merged.observe(
            obs,
            F.count(F.lit(1)).alias("rows_written"),
            F.count(F.when(F.col("_deleted"), 1)).alias("tombstones"),
        )

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
        stage=stage,
        # changelog pruning stats: every rewritten bucket's max
        # _last_offset is bounded by the batch's max offset — declared
        # for free, no extra scan (untouched buckets carry theirs)
        bucket_stats_updates=(
            {b: int(max_offset) for b in touched}
            if max_offset is not None and touched is not None
            else None
        ),
        base=base_snap,
    )
    stats_row = obs.get if obs is not None else None
    return {
        "batch_id": batch_id,
        "snapshot_version": snap.version,
        "staged": stage,
        "touched_buckets": touched,
        "rows_written": int(stats_row["rows_written"]) if stats_row else None,
        "tombstones": int(stats_row["tombstones"]) if stats_row else None,
    }
