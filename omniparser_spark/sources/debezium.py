"""Debezium-style CDC envelope decoder (public wire format).

Debezium is the de-facto public binlog/WAL tail format: each change
event is a JSON envelope carrying ``before`` / ``after`` row images, a
``source`` block (connector position: db, table, lsn, ts_ms) and a
one-letter ``op`` — ``c``reate / ``u``pdate / ``d``elete / ``r``ead
(snapshot).  This module normalizes that envelope into the engine's
canonical change schema (offset/op/conv_id/turn_idx/role/text/tool/ts)
so a Debezium topic can feed the same decode → LWW → fenced-MERGE apply
path as the native csv/json/xmlish/fixed feeds.

Reference parity note: the reference has no CDC surface at all — this
is the engine's own ingest format family (SURVEY.md §2.1 S-rows); the
*schema-driven decode with continuable per-record errors* policy
mirrors the reference's error taxonomy (``errs/errs.go:12-25``).

Scale shape: one ``from_json`` per row, pure whole-stage-codegen column
expressions, zero shuffles — at 10^10 events this stage is scan-bound,
exactly like the native decoders.  The op-code mapping and image
selection (``after`` for c/u/r, ``before`` for d) are ``when()``
branches over an already-parsed struct, so the plan carries exactly one
JSON parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniparser_spark.sources.decoders import RFC3339_FMT, TURN_FIELDS

_ROW_STRUCT = T.StructType(
    [T.StructField(n, t, True) for n, t in TURN_FIELDS]
)

# Debezium envelope: before/after row images + source position block.
# `lsn` is the log sequence number (Postgres) / binlog position
# (MySQL `pos`); either way a monotonic per-source offset — exactly
# what the fenced MERGE needs.
ENVELOPE_STRUCT = T.StructType(
    [
        T.StructField("before", _ROW_STRUCT, True),
        T.StructField("after", _ROW_STRUCT, True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("name", T.StringType(), True),
                    T.StructField("db", T.StringType(), True),
                    T.StructField("table", T.StringType(), True),
                    T.StructField("lsn", T.LongType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField("snapshot", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

# Debezium op -> canonical op. `r` (snapshot read) applies as an
# insert: replaying a consistent snapshot then the stream is the
# documented Debezium bootstrap, and the engine's LWW + idempotent
# MERGE make re-applied snapshot rows no-ops.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _op_canon(op: Column) -> Column:
    out = F.lit(None).cast("string")
    for deb, canon in _OP_MAP.items():
        out = F.when(op == deb, F.lit(canon)).otherwise(out)
    return out


def decode_debezium(
    df: DataFrame,
    payload_col: str = "payload",
    source_part_col: str | None = "source_part",
) -> DataFrame:
    """Debezium JSON envelopes -> canonical change rows.

    Input needs `payload` (the envelope JSON string); `source_part` is
    carried through if present (Kafka partition id in a real
    deployment).  Output: the canonical envelope columns
    (offset/op/source_part/conv_id/turn_idx/role/text/tool/ts) plus
    `pre_text` (the before-image text for u/d — NULL for inserts) and
    the continuable `_ok`/`_error` flags; rows with an unknown op or a
    missing row image flow to quarantine, never fail the batch.

    The row image follows Debezium semantics: `after` for c/u/r,
    `before` for d (a delete's identity lives in the before image).
    `ts` prefers the payload row's own ts (RFC3339 string), falling
    back to the transaction-level `ts_ms`.
    """
    env = F.from_json(F.col(payload_col), ENVELOPE_STRUCT)
    parsed = df.withColumn("_env", env)
    op = F.col("_env.op")
    canon_op = _op_canon(op)
    image = F.when(op == "d", F.col("_env.before")).otherwise(
        F.col("_env.after")
    )
    row_ts = F.try_to_timestamp(image.getField("ts"), F.lit(RFC3339_FMT))
    txn_ts = F.timestamp_millis(
        F.coalesce(F.col("_env.ts_ms"), F.col("_env.source.ts_ms"))
    )
    out = parsed.select(
        F.col("_env.source.lsn").alias("offset"),
        canon_op.alias("op"),
        (
            F.col(source_part_col)
            if source_part_col and source_part_col in df.columns
            else F.lit(0)
        ).cast("int").alias("source_part"),
        image.getField("conv_id").alias("conv_id"),
        image.getField("turn_idx").alias("turn_idx"),
        image.getField("role").alias("role"),
        F.coalesce(image.getField("text"), F.lit("")).alias("text"),
        F.nullif(image.getField("tool"), F.lit("")).alias("tool"),
        F.coalesce(row_ts, txn_ts).alias("ts"),
        F.col("_env.before").getField("text").alias("pre_text"),
        F.col("_env.source.db").alias("src_db"),
        F.col("_env.source.table").alias("src_table"),
        op.alias("src_op"),
        (
            canon_op.isNotNull()
            & F.col("_env.source.lsn").isNotNull()
            & image.getField("conv_id").isNotNull()
            & image.getField("turn_idx").isNotNull()
        ).alias("_ok"),
        F.col(payload_col),
    )
    err = F.when(
        ~F.col("_ok"),
        F.concat(
            F.lit("debezium decode failed: op="),
            F.coalesce(F.col("src_op"), F.lit("?")),
            F.lit(" lsn="),
            F.coalesce(F.col("offset").cast("string"), F.lit("?")),
        ),
    )
    return out.withColumn("_error", err)
