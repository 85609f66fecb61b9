"""Decoder correctness: the vectorized per-format decoders must recover
the exact plaintext turn fields the generator encoded — including
multi-byte UTF-8 (rune semantics for fixed-width), CSV quoting, XML
escaping, empty text and NULL tool."""

from __future__ import annotations

from pyspark.sql import functions as F

from omniparser_spark.operators.normalize import normalize_changes
from omniparser_spark.sources.changefeed import FeedSpec, generate_changes

SPEC = FeedSpec(n_events=800, n_convs=30, seed=11)


def test_roundtrip_all_formats(spark):
    df = generate_changes(spark, SPEC, keep_plaintext=True)
    truth = df.select(
        "offset",
        "format",
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("t_turn_idx"),
        F.col("role").alias("t_role"),
        F.col("text").alias("t_text"),
        F.col("tool").alias("t_tool"),
        F.unix_micros("ts").alias("t_ts_us"),
        "op",
        "payload",
        "ts",
        "source_part",
    )
    good, quarantine = normalize_changes(
        truth.select("offset", "op", "format", "payload", "ts", "source_part")
    )
    assert quarantine.count() == 0

    joined = good.join(truth.drop("op", "payload", "ts", "source_part"),
                       ["offset"], "inner")
    # fixed-width truncates text to 60 runes and collapses trailing
    # space; every fixture text is <= 60 runes so equality is exact
    mism = joined.filter(
        (F.col("conv_id") != F.col("t_conv_id"))
        | (F.col("turn_idx") != F.col("t_turn_idx"))
        | (F.col("role") != F.col("t_role"))
        | (F.col("text") != F.col("t_text"))
        | ~(
            F.col("tool").eqNullSafe(F.col("t_tool"))
        )
        | (F.unix_micros("ts") != F.col("t_ts_us"))
    )
    rows = mism.limit(5).collect()
    assert not rows, f"decoder mismatches: {rows}"


def test_formats_all_present(spark):
    df = generate_changes(spark, SPEC)
    fmts = {r["format"] for r in df.select("format").distinct().collect()}
    assert fmts == {"json", "csv", "xmlish", "fixed"}


def test_malformed_rows_quarantined(spark):
    rows = [
        (0, "I", "json", '{"conv_id": broken', None, 0),
        (1, "I", "csv", "only|three|fields", None, 0),
        (2, "I", "zebra", "??", None, 0),
    ]
    raw = spark.createDataFrame(
        rows,
        "offset bigint, op string, format string, payload string, "
        "ts timestamp, source_part int",
    )
    good, quarantine = normalize_changes(raw)
    assert good.count() == 0
    q = quarantine.collect()
    assert len(q) == 3
    assert all(r["error"] for r in q)
