"""Multi-table routing fan-out: per-destination exactly-once and
union-equality with the single-table replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omniparser_spark.cdc.pipeline import CdcPipeline
from omniparser_spark.cdc.routing import RoutedPipeline
from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed

SPEC = FeedSpec(n_events=1200, n_convs=40, seed=11)


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("routefeed") / "changes")
    return materialize_feed(spark, SPEC, path)


def _sorted_rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in df.collect()
    )


def test_routed_union_equals_single_table(spark, feed, tmp_path):
    routed = RoutedPipeline(
        spark,
        str(tmp_path / "routed"),
        routes={
            # key-aligned content routing: a conv_id hash splits whole
            # conversations, never one conversation's events
            "even": lambda: F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0,
            "odd": lambda: F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 1,
        },
        n_buckets=4,
        n_source_parts=SPEC.n_source_parts,
    )
    routed.run_feed(feed, SPEC.n_events, batch_size=400)

    single = CdcPipeline(
        spark,
        str(tmp_path / "single/table"),
        str(tmp_path / "single/ckpt"),
        n_buckets=4,
        n_source_parts=SPEC.n_source_parts,
    )
    single.run_feed(feed, SPEC.n_events, batch_size=400)

    union = routed.read("even").unionByName(routed.read("odd"))
    # key-aligned routes: per-destination LWW equals the global LWW
    # restricted to the route, so the union equals the single table
    assert _sorted_rows(union) == _sorted_rows(single.read_table())
    assert routed.read("even").count() > 0
    assert routed.read("odd").count() > 0


def test_routed_replay_is_fenced_per_destination(spark, feed, tmp_path):
    routed = RoutedPipeline(
        spark,
        str(tmp_path / "routed2"),
        routes={"all": lambda: F.lit(True)},
        n_buckets=4,
        n_source_parts=SPEC.n_source_parts,
    )
    first = routed.run_feed(feed, SPEC.n_events, batch_size=600)
    v1 = routed.pipes["all"].table.current().version
    # replaying from scratch offsets: checkpoints make it a no-op run
    again = routed.run_feed(feed, SPEC.n_events, batch_size=600)
    assert all(not r for r in again.values()) or all(
        rec.get("fenced") for recs in again.values() for rec in recs
    )
    assert routed.pipes["all"].table.current().version == v1
    assert len(first["all"]) == 2
