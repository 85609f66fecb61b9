"""Deterministic synthetic binlog/WAL-style change feed of transcript turns.

The feed mirrors the fixture spec in ``FIXTURES.md`` §2: one row per
change event with envelope columns

    offset:long  op:string(I|U|D|UP)  format:string(json|csv|xmlish|fixed)
    payload:string  ts:timestamp  source_part:int

where ``payload`` encodes a transcript turn (the ``input_hint`` shape:
conv_id, turn_idx, role, text, tool, ts) in one of four encodings that
mirror omniparser's file formats (reference sample corpus:
``extensions/omniv21/samples/{json,csv2,xml,fixedlength2}``).

Everything is generated **distributively** from ``spark.range`` with
pure column expressions — no driver-side loops, no wall clock, no
Python RNG — so the same generator that makes a 1k-event pytest
fixture makes a 10^10-event bench stream by changing one argument.
Determinism: every pseudo-random draw is ``xxhash64(col, lit(seed))``.

Fixture properties (all deterministic in ``seed``):
- Zipf-ish hot-key skew: ``hot_frac`` of events land on ``n_hot``
  conversations (skew/salting test).
- ~1% of events carry an out-of-order ``ts`` (late-data / LWW test).
- ~2% exact duplicate re-deliveries of an earlier offset
  (idempotency / exactly-once test).
- ``tool`` field only appears for offsets >= ``evolution_offset``
  (additive schema-evolution test; JSON payloads omit the key before).
- text includes multi-byte UTF-8, pipes, quotes, angle brackets and
  empty strings (CSV quoting / XML escaping / fixed-width rune tests).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed-width layout (1-based rune positions, FIXTURES.md §2d) —
# mirrors fixedlength2 start_pos/length semantics
# (reference: extensions/omniv21/fileformat/flatfile/fixedlength/decl.go:34-55).
FIXED_LAYOUT = [
    ("conv_id", 1, 12),
    ("turn_idx", 13, 5),
    ("role", 18, 10),
    ("text", 28, 60),
    ("tool", 88, 10),
    ("ts", 98, 24),
]

FORMATS = ["json", "csv", "xmlish", "fixed"]

CHANGE_SCHEMA = (
    "offset bigint, op string, format string, payload string, "
    "ts timestamp, source_part int"
)


@dataclass(frozen=True)
class FeedSpec:
    n_events: int = 1000
    n_convs: int = 50
    turns_per_conv: int = 16
    seed: int = 42
    n_hot: int = 3
    hot_frac: float = 0.25
    late_frac: float = 0.01
    dup_frac: float = 0.02
    delete_frac: float = 0.05
    evolution_frac: float = 0.5  # offsets past this fraction carry `tool`
    n_source_parts: int = 8
    base_epoch: int = 1717200000  # 2024-06-01T00:00:00Z, fixed


def _u(col: Column, seed: int, salt: str) -> Column:
    """Deterministic uniform int64 >= 0 from a column."""
    return F.abs(F.xxhash64(col.cast("string"), F.lit(f"{seed}:{salt}")))


def _frac(col: Column, seed: int, salt: str) -> Column:
    """Deterministic uniform double in [0,1)."""
    return (_u(col, seed, salt) % 1_000_000) / 1_000_000.0


def _xml_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return c


def _csv_quote(c: Column) -> Column:
    # RFC-4180-ish: always quote, double inner quotes
    return F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))


def generate_turn_fields(df: DataFrame, spec: FeedSpec) -> DataFrame:
    """Attach the plaintext turn fields to a DataFrame with an `offset` column."""
    s = spec.seed
    off = F.col("offset")

    # conversation assignment with hot-key skew
    is_hot = _frac(off, s, "hot") < spec.hot_frac
    conv_no = F.when(is_hot, _u(off, s, "hotpick") % spec.n_hot).otherwise(
        _u(off, s, "conv") % spec.n_convs
    )
    conv_id = F.format_string("conv_%06d", conv_no.cast("int"))
    turn_idx = (_u(off, s, "turn") % spec.turns_per_conv).cast("int")

    role_pick = _u(off, s, "role") % 4
    role = (
        F.when(role_pick == 0, "user")
        .when(role_pick == 1, "assistant")
        .when(role_pick == 2, "system")
        .otherwise("tool")
    )

    # text: deterministic, includes empties / multibyte / csv+xml hazards
    tmod = _u(off, s, "text") % 100
    base_text = F.concat(
        F.lit("turn "),
        turn_idx.cast("string"),
        F.lit(" rev "),
        off.cast("string"),
        F.lit(" "),
        F.substring(F.md5(off.cast("string")), 1, 12),
    )
    text = (
        F.when(tmod < 4, F.lit(""))
        .when(tmod < 12, F.concat(F.lit("héllo wörld 試験 "), base_text))
        .when(tmod < 20, F.concat(F.lit('with | pipe and "quote" '), base_text))
        .when(tmod < 26, F.concat(F.lit("a <tag> & amp "), base_text))
        .otherwise(base_text)
    )

    # additive evolution: tool only exists late in the stream
    evolution_offset = int(spec.n_events * spec.evolution_frac)
    tool_pick = _u(off, s, "tool") % 5
    tool_val = (
        F.when(tool_pick == 0, "search")
        .when(tool_pick == 1, "python")
        .when(tool_pick == 2, "browser")
        .otherwise(F.lit(None).cast("string"))
    )
    tool = F.when(off >= evolution_offset, tool_val).otherwise(
        F.lit(None).cast("string")
    )

    # event time: mostly monotone in offset, ~late_frac out-of-order
    late = _frac(off, s, "late") < spec.late_frac
    ts_sec = (
        F.lit(spec.base_epoch)
        + off
        + F.when(late, -(_u(off, s, "lateby") % 3600) - 60).otherwise(
            _u(off, s, "jitter") % 5
        )
    )
    ts = F.timestamp_seconds(ts_sec)

    op_pick = _frac(off, s, "op")
    op = (
        F.when(op_pick < spec.delete_frac, "D")
        .when(op_pick < spec.delete_frac + 0.45, "I")
        .when(op_pick < spec.delete_frac + 0.75, "U")
        .otherwise("UP")
    )

    fmt_pick = _u(off, s, "fmt") % 4
    fmt = (
        F.when(fmt_pick == 0, "json")
        .when(fmt_pick == 1, "csv")
        .when(fmt_pick == 2, "xmlish")
        .otherwise("fixed")
    )

    return df.select(
        off.alias("offset"),
        op.alias("op"),
        fmt.alias("format"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        (off % spec.n_source_parts).cast("int").alias("source_part"),
    )


def encode_payload(df: DataFrame, spec: FeedSpec) -> DataFrame:
    """Encode the plaintext turn fields into the per-format payload string.

    Pure column expressions (JVM-side, whole-stage codegen) — encoding a
    10^10-event stream shuffles nothing and runs at scan speed.
    """
    ts_str = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX")
    evolution_offset = int(spec.n_events * spec.evolution_frac)
    has_tool_field = F.col("offset") >= evolution_offset

    json_payload = F.when(
        has_tool_field,
        F.to_json(
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("role"),
                F.col("text"),
                F.col("tool"),
                ts_str.alias("ts"),
            )
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("role"),
                F.col("text"),
                ts_str.alias("ts"),
            )
        )
    )

    csv_payload = F.concat_ws(
        "|",
        F.col("conv_id"),
        F.col("turn_idx").cast("string"),
        F.col("role"),
        _csv_quote(F.col("text")),
        F.coalesce(F.col("tool"), F.lit("")),
        ts_str,
    )

    xml_payload = F.concat(
        F.lit('<turn conv_id="'),
        F.col("conv_id"),
        F.lit('" idx="'),
        F.col("turn_idx").cast("string"),
        F.lit('"><role>'),
        F.col("role"),
        F.lit("</role><text>"),
        _xml_escape(F.col("text")),
        F.lit("</text>"),
        F.when(
            F.col("tool").isNotNull(),
            F.concat(F.lit("<tool>"), F.col("tool"), F.lit("</tool>")),
        ).otherwise(F.lit("")),
        F.lit("<ts>"),
        ts_str,
        F.lit("</ts></turn>"),
    )

    def fixed_field(col: Column, width: int) -> Column:
        # rune-based pad/truncate — Spark substring/rpad are
        # code-point-based on strings, matching Go rune semantics
        # (reference decl.go:34-55); strip pipes/newlines first.
        clean = F.replace(col, F.lit("\n"), F.lit(" "))
        return F.rpad(F.substring(clean, 1, width), width, " ")

    fixed_payload = F.concat(
        *[
            fixed_field(
                (
                    F.col(name).cast("string")
                    if name != "ts"
                    else ts_str
                ),
                length,
            )
            if name != "tool"
            else fixed_field(F.coalesce(F.col("tool"), F.lit("")), length)
            for (name, _start, length) in FIXED_LAYOUT
        ]
    )

    payload = (
        F.when(F.col("format") == "json", json_payload)
        .when(F.col("format") == "csv", csv_payload)
        .when(F.col("format") == "xmlish", xml_payload)
        .otherwise(fixed_payload)
    )
    return df.withColumn("payload", payload)


def generate_changes(
    spark: SparkSession,
    spec: FeedSpec | None = None,
    num_partitions: int | None = None,
    keep_plaintext: bool = False,
) -> DataFrame:
    """Materialize the change feed: envelope columns only (payload encoded).

    ``keep_plaintext=True`` additionally keeps the ground-truth turn
    columns — used by tests to validate decoders, never by the engine.
    """
    spec = spec or FeedSpec()
    parts = num_partitions or max(
        8, spark.sparkContext.defaultParallelism
    )
    base = spark.range(0, spec.n_events, 1, parts).select(
        F.col("id").alias("offset")
    )
    turns = generate_turn_fields(base, spec)
    encoded = encode_payload(turns, spec)

    # duplicate re-deliveries: re-emit an exact copy of ~dup_frac rows
    dups = encoded.filter(_frac(F.col("offset"), spec.seed, "dup") < spec.dup_frac)
    feed = encoded.unionAll(dups)

    envelope = ["offset", "op", "format", "payload", "ts", "source_part"]
    if keep_plaintext:
        return feed
    return feed.select(*envelope)


def materialize_feed(
    spark: SparkSession,
    spec: FeedSpec,
    path: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Write the generated feed to parquet and return a reader of it.

    The engine consumes the feed as a *scan* (Kafka/binlog/files in
    production); materializing keeps every downstream action from
    re-evaluating the generator expression tree and lets offset-range
    predicates push down to parquet row groups.
    """
    generate_changes(spark, spec, num_partitions).write.mode("overwrite").parquet(
        path
    )
    return spark.read.parquet(path)
