"""Multi-table routing apply: fan one change feed out to several lake
tables (Debezium topic-routing / table-per-entity pattern).

A production change feed rarely lands in one table: transcripts split
by tenant, by retention class, by PII scope. The router partitions each
micro-batch's CANONICAL (post-decode) rows by a routing predicate and
applies every slice through the SAME exactly-once machinery — each
destination table keeps its own batch fence, checkpoint store, and
metrics, so a crash replays only the destinations that had not
committed (per-destination idempotency, no cross-table coordination:
the routing predicate is a pure function of the row, so re-deriving a
slice from the batch is deterministic).

Routing predicates MUST be key-aligned (a function of the merge key,
e.g. a conv_id hash or tenant prefix) — otherwise one key's events
split across destinations and each table resolves its own partial LWW
winner. Undecodable rows have NULL canonical columns; a `~_ok`
catch-all destination keeps them, otherwise content routes drop them
(each destination still quarantines its own slice's bad rows).

Scale shape: per destination, one decode+merge pipeline over its slice
(the offset and route predicates push into the scan); no extra shuffle
beyond each destination's own merge.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession

from omniparser_spark.cdc.pipeline import CdcPipeline


class RoutedPipeline:
    """A set of named destinations, each a full CdcPipeline, fed from
    one change feed by a routing predicate per destination.

    `routes`: name -> predicate Column builder over CANONICAL columns
    (called per run so each plan gets fresh Column objects). Rows
    matching no route are dropped (add a catch-all route to keep them).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        routes: dict[str, Callable[[], Column]],
        n_buckets: int = 8,
        n_source_parts: int | None = None,
    ):
        self.routes = routes
        self.pipes: dict[str, CdcPipeline] = {
            name: CdcPipeline(
                spark,
                f"{base_path}/{name}/table",
                f"{base_path}/{name}/ckpt",
                n_buckets=n_buckets,
                n_source_parts=n_source_parts,
            )
            for name in routes
        }

    def run_feed(
        self, feed: DataFrame, total_events: int, batch_size: int
    ) -> dict[str, list[dict[str, Any]]]:
        """Apply the feed to every destination. Each destination
        resumes from its OWN checkpoint — a partially-crashed fan-out
        self-heals on the next run (committed destinations fence their
        replayed batches to no-ops)."""
        return {
            name: self.pipes[name].run_feed(
                feed,
                total_events,
                batch_size,
                canon_filter=self.routes[name],
            )
            for name in self.routes
        }

    def read(self, name: str) -> DataFrame:
        return self.pipes[name].read_table()
