"""Physical-plan regression tests: the properties that make the engine
scale must be visible in the plan, not just implied by the code.

- offset-range + format predicates reach the parquet scan (Catalyst
  pushdown -> row-group pruning on a 10^10-event feed);
- the merge aggregate has a map-side partial phase (hot conversations
  collapse per input partition BEFORE the shuffle — the primary skew
  mitigation);
- the LWW operator family likewise partial-aggregates.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("planfeed") / "changes")
    return materialize_feed(
        spark, FeedSpec(n_events=2000, n_convs=50, seed=3), path
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_offset_and_format_predicates_push_to_scan(spark, feed):
    from omniparser_spark.operators.normalize import normalize_flagged

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        raw = feed.filter((F.col("offset") >= 100) & (F.col("offset") <= 900))
        plan = _plan(normalize_flagged(raw))
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(offset,100)" in plan
        assert "LessThanOrEqual(offset,900)" in plan
        # per-format dispatch branches each push their format equality
        assert "EqualTo(format,json)" in plan
        assert "EqualTo(format,fixed)" in plan
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_offset_filter_after_normalize_pushes_to_scan(spark, feed):
    """run_feed builds the decode tree ONCE over the whole feed and
    slices each micro-batch by filtering the normalized frame — the
    offset predicate must still travel through the per-format union and
    decode projections down to the parquet scan."""
    from omniparser_spark.operators.normalize import normalize_flagged

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        canon_full = normalize_flagged(feed)
        sliced = canon_full.filter(
            (F.col("offset") >= 100) & (F.col("offset") <= 900)
        )
        plan = _plan(sliced)
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(offset,100)" in plan
        assert "LessThanOrEqual(offset,900)" in plan
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_merge_aggregate_is_map_side_combinable(spark, feed, tmp_path):
    """The MERGE's LWW winner must partial-aggregate before the
    shuffle; a plan that ships every raw event of a hot key to one
    reducer does not survive skew at 10^10 events."""
    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.operators.normalize import (
        normalize_flagged,
        split_flagged,
    )

    pipe = CdcPipeline(
        spark,
        str(tmp_path / "plan_table"),
        str(tmp_path / "plan_ckpt"),
        n_buckets=4,
        n_source_parts=8,
    )
    # drive one real batch, then inspect the plan the merge would build
    raw = feed.filter((F.col("offset") >= 0) & (F.col("offset") <= 999))
    pipe.apply_batch(raw, batch_id=0, offset_start=0, offset_end=999)

    good, _ = split_flagged(normalize_flagged(raw))
    from omniparser_spark.lake.merge import bucket_expr

    target = pipe.table.read(include_hidden=True)
    t = target.select(
        "conv_id", "turn_idx", "ts", "_last_offset", "_deleted"
    )
    s = good.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("offset").alias("_last_offset"),
        (F.col("op") == "D").alias("_deleted"),
    )
    merged = (
        t.unionByName(s)
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("ts", "_last_offset", "_deleted"),
                F.struct("ts", "_last_offset"),
            ).alias("w")
        )
    )
    plan = _plan(merged)
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower(), plan


def test_lww_dedup_partial_aggregates(spark, feed):
    from omniparser_spark.operators.dedup import lww_dedup
    from omniparser_spark.operators.normalize import (
        normalize_flagged,
        split_flagged,
    )

    good, _ = split_flagged(normalize_flagged(feed))
    plan = _plan(lww_dedup(good, keys=("conv_id", "turn_idx")))
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower(), plan


def test_csv_header_verify_broadcasts(spark):
    """The one-row-per-file header set must broadcast to the data-row
    join — a shuffle join keyed on file_id would co-shuffle the whole
    corpus just to check headers."""
    from omniparser_spark.sources.decoders import verify_csv_header

    lines = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("file_id"),
        (F.col("id") + 2).alias("line_no"),
        F.concat_ws(",", F.lit("a"), F.col("id").cast("string")).alias("line"),
    )
    data, _ = verify_csv_header(lines, ["a", "b"])
    assert "BroadcastHashJoin" in _plan(data)


def test_ngram_df_cap_partial_aggregates(spark):
    """Both the shingle-frequency count and the pair-intersection count
    must partial-aggregate map-side."""
    from omniparser_spark.operators.dedup_text import ngram_jaccard_pairs

    d = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words here number "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(ngram_jaccard_pairs(d, max_df=5))
    assert "partial_count" in plan


def test_decoder_family_is_shuffle_free(spark, feed):
    """EDI tree / namespace-XML / charset decoders are scan-bound: no
    Exchange may appear in their plans."""
    from omniparser_spark.sources.decoders import decode_charset
    from omniparser_spark.sources.edi import edi_element, edi_tree

    df = feed.select(
        "offset",
        F.concat(F.lit("SEG*a?*b~REF*"), F.col("format")).alias("p"),
    )
    tree = edi_tree(F.col("p"))
    edi_plan = _plan(df.select(edi_element(tree, "REF", 1).alias("v")))
    assert "Exchange" not in edi_plan

    cs_plan = _plan(
        feed.select(
            decode_charset(F.encode("format", "UTF-8"), "windows-1252")
        )
    )
    assert "Exchange" not in cs_plan


def test_asof_join_is_single_shuffle(spark):
    """The as-of join must be ONE exchange (the union keyed by the join
    key) + a per-key sort — never a range-join cross product."""
    from omniparser_spark.operators.asof import asof_join

    left = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.lit("e").alias("ev"),
    )
    right = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 600).alias("ts"),
        F.lit("v").alias("val"),
    )
    plan = _plan(asof_join(left, right, key="k"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_profile_counts_partial_aggregate(spark):
    """count/min/max/sum in the profile must combine map-side (the
    exact percentile is reducer-side by design for bounded groups)."""
    from omniparser_spark.operators.profile import profile_numeric

    d = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("g"), F.rand(7).alias("v")
    )
    plan = _plan(profile_numeric(d, ["g"], "v"))
    assert "partial_count" in plan or "partial_min" in plan


def test_chunking_is_shuffle_free(spark):
    from omniparser_spark.functions.redact import chunk_text, redact_pii

    d = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"),
    )
    assert "Exchange" not in _plan(chunk_text(d))
    assert "Exchange" not in _plan(d.select(redact_pii("text")))


def test_merge_lww_and_placement_share_one_shuffle(spark, feed, tmp_path):
    """The REAL merge plan (round-7 one-shuffle rewrite): the LWW
    aggregate runs on top of the exact-bucket placement's partitioning
    — exactly ONE Exchange between the sources and the write, and the
    single-file-per-touched-bucket property still holds on disk."""
    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.lake.table import (
        bucket_expr,
        place_exact_buckets,
    )

    pipe = CdcPipeline(
        spark,
        str(tmp_path / "os_table"),
        str(tmp_path / "os_ckpt"),
        n_buckets=4,
        n_source_parts=8,
    )
    raw = feed.filter((F.col("offset") >= 0) & (F.col("offset") <= 999))
    pipe.apply_batch(raw, batch_id=0, offset_start=0, offset_end=999)
    raw2 = feed.filter((F.col("offset") >= 1000) & (F.col("offset") <= 1999))
    pipe.apply_batch(raw2, batch_id=1, offset_start=1000, offset_end=1999)

    # physical consequence on disk: one data file per touched bucket
    from collections import Counter

    counts = Counter()
    for r in pipe.table.meta("files").collect():
        counts[r["bucket"]] += 1
    assert counts and max(counts.values()) == 1, counts

    # plan shape: the one-shuffle merge (union -> place -> group with
    # the placement cols prepended) plans exactly one hashpartitioning
    # Exchange — the aggregate reuses the placement's partitioning
    t = pipe.table.read(include_hidden=True).select(
        "conv_id", "turn_idx", "ts", "_last_offset", "_deleted"
    )
    from omniparser_spark.operators.normalize import (
        normalize_flagged,
        split_flagged,
    )

    good, _ = split_flagged(normalize_flagged(raw2))
    s = good.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("offset").cast("long").alias("_last_offset"),
        (F.col("op") == "D").alias("_deleted"),
    )
    u = t.unionByName(s).withColumn("_bucket", bucket_expr("conv_id", 4))
    placed, extra = place_exact_buckets(u, 4)
    merged = placed.groupBy(*extra, "_bucket", "conv_id", "turn_idx").agg(
        F.max_by(
            F.struct("ts", "_last_offset", "_deleted"),
            F.struct("ts", "_last_offset"),
        ).alias("w")
    )
    plan = _plan(merged)
    assert plan.count("Exchange hashpartitioning") == 1, plan
