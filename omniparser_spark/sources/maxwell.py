"""Maxwell and Canal CDC envelope decoders (public wire formats).

Alongside Debezium (``sources/debezium.py``), Maxwell (Zendesk's MySQL
binlog daemon) and Canal (Alibaba's MySQL binlog tail, flat-message
JSON) are the other two widely deployed open CDC envelope dialects.
Both normalize here onto the engine's canonical change schema
(offset/op/source_part/conv_id/turn_idx/role/text/tool/ts + pre_text)
so any of the three topic families feeds the same
decode → LWW → fenced-MERGE apply path.

Format facts encoded below (from the projects' public docs):

Maxwell (one JSON object per row change):
- ``type``: insert / update / delete / bootstrap-insert, plus control
  records (bootstrap-start/complete, table-create/alter) that carry no
  row data — continuable quarantine here;
- ``data`` is the FULL row image for all row ops (for delete it is the
  deleted row), ``old`` carries ONLY the changed columns' previous
  values on updates (partial pre-image — an unchanged column is absent,
  so ``pre_text`` is NULL unless text itself changed);
- ``ts`` is epoch SECONDS; ``position`` is "binlogfile:offset". A
  single monotonic offset is derived as file_seq * 2^32 + pos, which
  preserves the (file, pos) total order binlogs are replayed in.

Canal flatMessage (one JSON object per binlog EVENT, rows batched):
- ``type`` is uppercase INSERT/UPDATE/DELETE; DDL events carry
  ``isDdl: true`` and quarantine;
- ``data`` is an ARRAY of row images with ALL VALUES AS STRINGS
  (canal's flat codec stringifies numbers), ``old`` is the parallel
  array of partial pre-images; rows explode with ``posexplode`` so the
  derived offset ``id * 4096 + row_index`` stays unique and ordered
  within the event (canal's own fence is the topic offset; the 4096
  stride bounds rows-per-event, asserted continuable);
- ``es`` is the binlog event time (ms), ``ts`` the process time (ms) —
  the engine uses ``es`` (event time governs LWW).

Scale shape: one ``from_json`` per row, whole-stage-codegen column
expressions, zero shuffles (canal's posexplode is a narrow map) — at
10^10 events both stages are scan-bound, same as the native decoders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniparser_spark.sources.decoders import RFC3339_FMT, TURN_FIELDS

_ROW_STRUCT = T.StructType(
    [T.StructField(n, t, True) for n, t in TURN_FIELDS]
)

MAXWELL_STRUCT = T.StructType(
    [
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch seconds
        T.StructField("xid", T.LongType(), True),
        T.StructField("commit", T.BooleanType(), True),
        T.StructField("position", T.StringType(), True),
        T.StructField("data", _ROW_STRUCT, True),
        T.StructField("old", _ROW_STRUCT, True),
    ]
)

# canal flat message stringifies every column value
_CANAL_ROW = T.MapType(T.StringType(), T.StringType())

CANAL_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        T.StructField("isDdl", T.BooleanType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("es", T.LongType(), True),  # binlog event ms
        T.StructField("ts", T.LongType(), True),  # process ms
        T.StructField("data", T.ArrayType(_CANAL_ROW), True),
        T.StructField("old", T.ArrayType(_CANAL_ROW), True),
    ]
)

_MAXWELL_OPS = {"insert": "I", "bootstrap-insert": "I",
                "update": "U", "delete": "D"}
_CANAL_OPS = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}

# rows-per-canal-event stride for the derived offset; a flat message
# batching more rows than this would alias offsets, so it quarantines
CANAL_MAX_ROWS_PER_EVENT = 4096


def _once(col: Column) -> Column:
    """Nondeterministic identity barrier: wraps the parsed envelope
    struct so the optimizer can neither inline it into every field
    reference (CollapseProject) nor substitute it into pushed-down
    filters. Without it the plan audit found EIGHT copies of the full
    to_json+from_json chain inside the pushed `_ok` filter plus one
    per projected field (guide §4.4's duplicated-evaluation fix,
    applied to a JVM expression — there is no public
    `asNondeterministic` for columns, so the idiom is a
    value-preserving shuffle of a one-element array)."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def _map_op(op: Column, mapping: dict[str, str]) -> Column:
    out = F.lit(None).cast("string")
    for src, canon in mapping.items():
        out = F.when(op == src, F.lit(canon)).otherwise(out)
    return out


def decode_maxwell(
    df: DataFrame,
    payload_col: str = "payload",
    source_part_col: str | None = "source_part",
) -> DataFrame:
    """Maxwell JSON envelopes -> canonical change rows.

    Output matches `decode_debezium`'s contract: canonical envelope
    columns + `pre_text` (Maxwell's partial `old` image: NULL unless
    the text column itself changed) + continuable `_ok`/`_error`.
    Control records (bootstrap-start/complete, DDL) and rows with an
    unparsable position quarantine instead of failing the batch.
    """
    env = _once(F.from_json(F.col(payload_col), MAXWELL_STRUCT))
    parsed = df.withColumn("_env", env)
    op = F.col("_env.type")
    canon_op = _map_op(op, _MAXWELL_OPS)
    image = F.col("_env.data")
    # "master.000006:800911" -> 6 * 2^32 + 800911 (preserves binlog
    # replay order across file rotations)
    pos_file = F.regexp_extract(
        F.col("_env.position"), r"\.(\d+):(\d+)$", 1
    ).try_cast("long")
    pos_off = F.regexp_extract(
        F.col("_env.position"), r"\.(\d+):(\d+)$", 2
    ).try_cast("long")
    offset = (pos_file * F.lit(1 << 32) + pos_off).alias("offset")
    row_ts = F.try_to_timestamp(image.getField("ts"), F.lit(RFC3339_FMT))
    out = parsed.select(
        offset,
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
        F.coalesce(
            row_ts, F.timestamp_seconds(F.col("_env.ts"))
        ).alias("ts"),
        F.col("_env.old").getField("text").alias("pre_text"),
        F.col("_env.database").alias("src_db"),
        F.col("_env.table").alias("src_table"),
        op.alias("src_op"),
        (
            canon_op.isNotNull()
            & pos_file.isNotNull()
            & pos_off.isNotNull()
            & image.getField("conv_id").isNotNull()
            & image.getField("turn_idx").isNotNull()
        ).alias("_ok"),
        F.col(payload_col),
    )
    err = F.when(
        ~F.col("_ok"),
        F.concat(
            F.lit("maxwell decode failed: type="),
            F.coalesce(F.col("src_op"), F.lit("?")),
            F.lit(" position="),
            F.coalesce(F.col("offset").cast("string"), F.lit("?")),
        ),
    )
    return out.withColumn("_error", err)


def decode_canal(
    df: DataFrame,
    payload_col: str = "payload",
    source_part_col: str | None = "source_part",
) -> DataFrame:
    """Canal flatMessage JSON envelopes -> canonical change rows.

    One envelope may batch several row images (`data` is an array);
    rows posexplode to one canonical row each, offset = envelope id *
    4096 + row index. All canal values arrive as strings — turn_idx
    casts with try_cast so a malformed number quarantines the ROW, not
    the batch. DDL events, unknown types, and oversize batches (>= 4096
    rows, which would alias offsets) quarantine as whole envelopes with
    a NULL row payload.
    """
    env = _once(F.from_json(F.col(payload_col), CANAL_STRUCT))
    parsed = df.withColumn("_env", env)
    op = F.col("_env.type")
    canon_op = _map_op(op, _CANAL_OPS)
    env_ok = (
        canon_op.isNotNull()
        & ~F.coalesce(F.col("_env.isDdl"), F.lit(False))
        & F.col("_env.id").isNotNull()
        & (F.size(F.col("_env.data")) < CANAL_MAX_ROWS_PER_EVENT)
        & (F.size(F.col("_env.data")) > 0)
    )
    # quarantined envelopes keep one NULL-row entry so they surface as
    # exactly one dead-letter record (posexplode of NULL drops rows)
    rows = F.when(env_ok, F.col("_env.data")).otherwise(
        F.array(F.lit(None).cast(_CANAL_ROW))
    )
    exploded = parsed.select(
        F.col("_env"),
        op.alias("src_op"),
        canon_op.alias("_canon_op"),
        env_ok.alias("_env_ok"),
        (
            F.col(source_part_col)
            if source_part_col and source_part_col in df.columns
            else F.lit(0)
        ).cast("int").alias("source_part"),
        F.col(payload_col),
        F.posexplode(rows).alias("_idx", "_row"),
    )
    row = F.col("_row")
    turn_idx = row.getItem("turn_idx").try_cast("int")
    pre = F.col("_env.old").getItem(F.col("_idx"))
    ok = (
        F.col("_env_ok")
        & row.getItem("conv_id").isNotNull()
        & turn_idx.isNotNull()
    )
    out = exploded.select(
        (
            F.col("_env.id") * F.lit(CANAL_MAX_ROWS_PER_EVENT)
            + F.col("_idx")
        ).alias("offset"),
        F.col("_canon_op").alias("op"),
        F.col("source_part"),
        row.getItem("conv_id").alias("conv_id"),
        turn_idx.alias("turn_idx"),
        row.getItem("role").alias("role"),
        F.coalesce(row.getItem("text"), F.lit("")).alias("text"),
        F.nullif(row.getItem("tool"), F.lit("")).alias("tool"),
        F.coalesce(
            F.try_to_timestamp(row.getItem("ts"), F.lit(RFC3339_FMT)),
            F.timestamp_millis(F.col("_env.es")),
        ).alias("ts"),
        pre.getItem("text").alias("pre_text"),
        F.col("_env.database").alias("src_db"),
        F.col("_env.table").alias("src_table"),
        F.col("src_op"),
        ok.alias("_ok"),
        F.col(payload_col),
    )
    err = F.when(
        ~F.col("_ok"),
        F.concat(
            F.lit("canal decode failed: type="),
            F.coalesce(F.col("src_op"), F.lit("?")),
            F.lit(" id="),
            F.coalesce(F.col("offset").cast("string"), F.lit("?")),
        ),
    )
    return out.withColumn("_error", err)
