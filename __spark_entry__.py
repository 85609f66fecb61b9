"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: full CDC apply (synthetic transcript change
feed -> vectorized decode -> normalize -> LWW dedup -> MERGE into the
lake table) and returns the final transcripts state.

`queries()` / `oracle_sql()` — one entry per operator from SURVEY.md §2
(+ the training-data ops), each cross-checked against DuckDB at sf0.01.

Conventions for engine-independent value hashing:
- every double is round(x, 6) on BOTH sides,
- timestamps are compared as epoch microseconds (unix_micros/epoch_us),
- hashes use md5 (identical in any engine), never xxhash64/hash().
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

US = "\x1f"


def _us(col) -> "F.Column":
    """epoch micros; testdata parquet timestamps are TIMESTAMP_NTZ —
    cast to session-TZ (UTC) timestamp first, matching DuckDB epoch_us."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """CDC end-to-end at sf0.001-ish scale: replay a 2k-event synthetic
    transcript change stream through normalize -> LWW -> MERGE and
    return the final table state (stable schema, >0 rows)."""
    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed

    spec = FeedSpec(n_events=2000, n_convs=60, seed=42)
    tmp = tempfile.mkdtemp(prefix="omniparser_spark_entry_")
    pipe = CdcPipeline(
        spark, f"{tmp}/table", f"{tmp}/ckpt", n_buckets=8
    )
    feed = materialize_feed(spark, spec, f"{tmp}/feed")

    def feed_for_range(start: int, end: int) -> DataFrame:
        return feed.filter(
            (F.col("offset") >= start) & (F.col("offset") <= end)
        )

    pipe.run(feed_for_range, spec.n_events, batch_size=500)
    return pipe.read_table().orderBy("conv_id", "turn_idx")


# --------------------------------------------------------------------------
# query registry
# --------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------- CDC core

@_q(
    "lww_dedup",
    """
    SELECT user_id, event_type, event_id AS offset_win,
           epoch_us(ts) AS ts_us, round(value, 6) AS value_r
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _lww(spark, sf_dir):
    """LWW winner per (user_id, event_type) by (ts, event_id) — the
    map-side-combinable max_by aggregate (operators/dedup.py)."""
    from omniparser_spark.operators.dedup import lww_dedup

    ev = _t(spark, sf_dir, "events")
    out = lww_dedup(ev, keys=("user_id", "event_type"), order=("ts", "event_id"))
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("offset_win"),
        _us("ts").alias("ts_us"),
        F.round("value", 6).alias("value_r"),
    )


@_q(
    "lww_dedup_salted",
    """
    SELECT user_id, event_type, event_id AS offset_win
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _lww_salted(spark, sf_dir):
    """Two-phase salted LWW — identical result, skew-resistant plan."""
    from omniparser_spark.operators.dedup import lww_dedup_salted

    ev = _t(spark, sf_dir, "events")
    out = lww_dedup_salted(
        ev, keys=("user_id", "event_type"), order=("ts", "event_id"), n_salts=8
    )
    return out.select(
        "user_id", "event_type", F.col("event_id").alias("offset_win")
    )


@_q(
    "lww_dedup_window",
    """
    SELECT user_id, event_type, event_id AS offset_win
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _lww_window(spark, sf_dir):
    from omniparser_spark.operators.dedup import lww_dedup_window

    ev = _t(spark, sf_dir, "events")
    out = lww_dedup_window(
        ev, keys=("user_id", "event_type"), order=("ts", "event_id")
    )
    return out.select(
        "user_id", "event_type", F.col("event_id").alias("offset_win")
    )


# ------------------------------------------------------- format decoders
# Each roundtrip builds a payload string from a testdata table inside
# the query (identically in both engines), then the ENGINE decodes it
# back with its vectorized decoder while the ORACLE decodes with plain
# SQL string functions — proving decode correctness on shared data.

@_q(
    "decode_csv_roundtrip",
    """
    WITH enc AS (
      SELECT event_id,
             event_id::VARCHAR || '|' || event_type || '|' || value::VARCHAR
               AS payload
      FROM events
    )
    SELECT event_id,
           split_part(payload, '|', 1)::BIGINT AS dec_id,
           split_part(payload, '|', 2) AS dec_type,
           round(split_part(payload, '|', 3)::DOUBLE, 6) AS dec_value
    FROM enc
    """,
)
def _dec_csv(spark, sf_dir):
    """CSV source (S1/S2): from_csv over a delimited payload column."""
    ev = _t(spark, sf_dir, "events")
    enc = ev.select(
        "event_id",
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("event_type"),
            F.col("value").cast("string"),
        ).alias("payload"),
    )
    parsed = F.from_csv(
        F.col("payload"),
        F.lit("dec_id bigint, dec_type string, dec_value double"),
        {"sep": "|"},
    )
    return enc.select(
        "event_id",
        parsed.getField("dec_id").alias("dec_id"),
        parsed.getField("dec_type").alias("dec_type"),
        F.round(parsed.getField("dec_value"), 6).alias("dec_value"),
    )


@_q(
    "decode_json_payload",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k_val
    FROM events
    """,
)
def _dec_json(spark, sf_dir):
    """JSON source (S6): from_json on the real `props` JSON column."""
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k bigint")
    return ev.select("event_id", parsed.getField("k").alias("k_val"))


@_q(
    "decode_fixed_roundtrip",
    """
    WITH enc AS (
      SELECT doc_id,
             rpad(lang, 8, ' ') || rpad(source, 12, ' ') ||
             lpad(doc_id::VARCHAR, 10, '0') ||
             rpad(substr(text, 1, 20), 20, ' ') AS payload
      FROM documents
    )
    SELECT doc_id,
           rtrim(substr(payload, 1, 8)) AS dec_lang,
           rtrim(substr(payload, 9, 12)) AS dec_source,
           substr(payload, 21, 10)::BIGINT AS dec_id,
           rtrim(substr(payload, 31, 20)) AS dec_text20
    FROM enc
    """,
)
def _dec_fixed(spark, sf_dir):
    """Fixed-length source (S3/S4): 1-based code-point substring slicing
    incl. multi-byte text (rune semantics, reference decl.go:34-55)."""
    docs = _t(spark, sf_dir, "documents")
    enc = docs.select(
        "doc_id",
        F.concat(
            F.rpad("lang", 8, " "),
            F.rpad("source", 12, " "),
            F.lpad(F.col("doc_id").cast("string"), 10, "0"),
            F.rpad(F.substring("text", 1, 20), 20, " "),
        ).alias("payload"),
    )
    return enc.select(
        "doc_id",
        F.rtrim(F.substring("payload", 1, 8)).alias("dec_lang"),
        F.rtrim(F.substring("payload", 9, 12)).alias("dec_source"),
        F.substring("payload", 21, 10).cast("bigint").alias("dec_id"),
        F.rtrim(F.substring("payload", 31, 20)).alias("dec_text20"),
    )


@_q(
    "decode_xmlish_roundtrip",
    """
    WITH enc AS (
      SELECT event_id,
             '<e id="' || event_id || '"><t>' || event_type ||
             '</t><v>' || value || '</v></e>' AS payload
      FROM events
    )
    SELECT event_id,
           regexp_extract(payload, 'id="(\\d+)"', 1)::BIGINT AS dec_id,
           regexp_extract(payload, '<t>([^<]*)</t>', 1) AS dec_type,
           round(regexp_extract(payload, '<v>([^<]*)</v>', 1)::DOUBLE, 6)
             AS dec_value
    FROM enc
    """,
)
def _dec_xml(spark, sf_dir):
    """XML source (S5): from_xml with attribute + element extraction."""
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    enc = ev.select(
        "event_id",
        F.concat(
            F.lit('<e id="'),
            F.col("event_id").cast("string"),
            F.lit('"><t>'),
            F.col("event_type"),
            F.lit("</t><v>"),
            F.col("value").cast("string"),
            F.lit("</v></e>"),
        ).alias("payload"),
    )
    xml_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), True),
            T.StructField("t", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    parsed = F.from_xml(F.col("payload"), xml_schema, {"attributePrefix": "_"})
    return enc.select(
        "event_id",
        parsed.getField("_id").alias("dec_id"),
        parsed.getField("t").alias("dec_type"),
        F.round(parsed.getField("v"), 6).alias("dec_value"),
    )


@_q(
    "decode_ediish_roundtrip",
    """
    WITH enc AS (
      SELECT event_id,
             'EVT*' || event_id || '*' || event_type || '~VAL*' ||
             value || '*' || user_id AS payload
      FROM events
    ),
    segs AS (
      SELECT event_id,
             string_split(payload, '~') AS segments
      FROM enc
    )
    SELECT event_id,
           split_part(segments[1], '*', 2)::BIGINT AS dec_id,
           split_part(segments[1], '*', 3) AS dec_type,
           round(split_part(segments[2], '*', 2)::DOUBLE, 6) AS dec_value,
           split_part(segments[2], '*', 3)::BIGINT AS dec_user
    FROM segs
    """,
)
def _dec_edi(spark, sf_dir):
    """EDI source (S7): segment split (~) then element split (*) with
    (segment, element-index) addressing — split + getItem, JVM-side."""
    ev = _t(spark, sf_dir, "events")
    enc = ev.select(
        "event_id",
        F.concat(
            F.lit("EVT*"),
            F.col("event_id").cast("string"),
            F.lit("*"),
            F.col("event_type"),
            F.lit("~VAL*"),
            F.col("value").cast("string"),
            F.lit("*"),
            F.col("user_id").cast("string"),
        ).alias("payload"),
    )
    segs = F.split(F.col("payload"), "~")
    seg0 = F.split(segs.getItem(0), r"\*")
    seg1 = F.split(segs.getItem(1), r"\*")
    return enc.select(
        "event_id",
        seg0.getItem(1).cast("bigint").alias("dec_id"),
        seg0.getItem(2).alias("dec_type"),
        F.round(seg1.getItem(1).cast("double"), 6).alias("dec_value"),
        seg1.getItem(2).cast("bigint").alias("dec_user"),
    )


# ------------------------------------------------- filter / project / guard

@_q(
    "filter_predicate",
    """
    SELECT event_type, count(*) AS n,
           (sum(value::DECIMAL(18,2))::DOUBLE) AS total
    FROM events
    WHERE regexp_matches(event_type, '^(signup|purchase)$')
      AND value > 50.0
    GROUP BY event_type
    """,
)
def _filter(spark, sf_dir):
    """Record filter (F1): xpath-predicate -> rlike + comparison,
    pushed to the scan by Catalyst."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").rlike("^(signup|purchase)$"))
        .filter(F.col("value") > 50.0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@_q(
    "cardinality_guard",
    """
    SELECT source, count(DISTINCT lang) AS n_langs,
           (count(DISTINCT lang) <= 1) AS guard_ok
    FROM documents GROUP BY source
    """,
)
def _guard(spark, sf_dir):
    """Cardinality guard (F2): 0-or-1 match rule as a per-group check
    (reference idr/query.go:76-96 single-match enforcement)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.countDistinct("lang").alias("n_langs"),
        (F.countDistinct("lang") <= 1).alias("guard_ok"),
    )


@_q(
    "project_dynamic",
    """
    SELECT event_id,
           json_extract_string(props, '$.' || 'k')::BIGINT AS picked
    FROM events
    """,
)
def _proj_dyn(spark, sf_dir):
    """Dynamic projection (P2, `xpath_dynamic`): the extraction path is
    computed from row data at runtime (get_json_object with a built
    path)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(
            F.col("props"), "$.k"
        ).cast("bigint").alias("picked"),
    )


# ----------------------------------------------------------- reshape ops

@_q(
    "array_reshape",
    """
    SELECT doc_id,
           array_to_string(
             list_transform(
               (regexp_split_to_array(trim(text), '\\s+'))[1:5],
               w -> upper(w)),
             ' ') AS head5_upper,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_words
    FROM documents WHERE length(trim(text)) > 0
    """,
)
def _arr_reshape(spark, sf_dir):
    """Array reshape (R1): multi-select -> per-element transform ->
    re-concat (F.transform / slice on array columns, no explode)."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    return d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(words, 1, 5), lambda w: F.upper(w)), " "
        ).alias("head5_upper"),
        F.size(words).alias("n_words"),
    )


@_q(
    "object_reshape",
    """
    SELECT o_orderkey AS okey,
           o_orderstatus AS status,
           round(o_totalprice, 6) AS total,
           epoch_us(o_orderdate) AS odate_us
    FROM orders
    """,
)
def _obj_reshape(spark, sf_dir):
    """Object reshape (R2): named-children projection with aliasing
    (struct build + flatten; empties stay NULL per policy)."""
    o = _t(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 6).alias("total"),
        _us("o_orderdate").alias("odate_us"),
    )
    return o.select(s.alias("obj")).select("obj.*")


# ------------------------------------------------------ casts / trim / null

@_q(
    "cast_matrix",
    """
    SELECT event_id,
           trunc(value)::BIGINT AS v_long,
           (value > 100.0) AS v_bool,
           event_id::VARCHAR AS v_str,
           try_cast(event_type AS DOUBLE) AS v_bad
    FROM events
    """,
)
def _casts(spark, sf_dir):
    """Type-cast matrix (T1): float->int truncation, ->bool, ->string,
    and continuable failure via try_cast (transform/value.go:21-82)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("long").alias("v_long"),
        (F.col("value") > 100.0).alias("v_bool"),
        F.col("event_id").cast("string").alias("v_str"),
        F.col("event_type").try_cast("double").alias("v_bad"),
    )


@_q(
    "trim_and_prune",
    """
    SELECT doc_id,
           trim('  ' || text || ' ') AS trimmed,
           nullif(text, '') AS pruned,
           (nullif(text, '') IS NULL) AS was_empty
    FROM documents
    """,
)
def _trim(spark, sf_dir):
    """Trim policy (T2) + empty/null pruning (T3)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(F.concat(F.lit("  "), F.col("text"), F.lit(" "))).alias("trimmed"),
        F.nullif(F.col("text"), F.lit("")).alias("pruned"),
        F.nullif(F.col("text"), F.lit("")).isNull().alias("was_empty"),
    )


# ------------------------------------------------------------ custom funcs

@_q(
    "func_string_suite",
    """
    SELECT event_id,
           CASE WHEN event_type <> '' THEN event_type ELSE 'fallback' END
             AS coalesced,
           lower(event_type) || '-' || upper(event_type) AS cat,
           md5(event_type || chr(31) || event_id::VARCHAR) AS checksum_md5
    FROM events
    """,
)
def _func_str(spark, sf_dir):
    """coalesce/concat/lower/upper (C3-C5) + record checksum (E3)."""
    from omniparser_spark.functions import builtin as B

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        B.coalesce_nonempty(F.col("event_type"), F.lit("fallback")).alias(
            "coalesced"
        ),
        B.concat(B.lower(F.col("event_type")), F.lit("-"),
                 B.upper(F.col("event_type"))).alias("cat"),
        F.md5(
            F.concat_ws(US, F.col("event_type"), F.col("event_id").cast("string"))
        ).alias("checksum_md5"),
    )


@_q(
    "func_uuidv3",
    """
    WITH h AS (
      SELECT event_id, md5(repeat(chr(0), 16) || event_type) AS hx
      FROM events
    )
    SELECT event_id,
           lower(substr(hx,1,8) || '-' || substr(hx,9,4) || '-3'
           || substr(hx,14,3) || '-' ||
           lpad(to_hex((('0x'||substr(hx,17,2))::BIGINT & 63) | 128), 2, '0')
           || substr(hx,19,2) || '-' || substr(hx,21,12)) AS uuid3
    FROM h
    """,
)
def _func_uuid(spark, sf_dir):
    """uuidv3 (C6): RFC-4122 v3 with nil namespace, byte-compatible
    with the reference (customfuncs/customFuncs.go:76-79)."""
    from omniparser_spark.functions import builtin as B

    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", B.uuidv3(F.col("event_type")).alias("uuid3"))


@_q(
    "func_datetime_suite",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS rfc3339,
           epoch(date_trunc('second', ts))::BIGINT AS epoch_s,
           epoch_ms(ts) AS epoch_ms,
           epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                             '%Y-%m-%d %H:%M:%S')) AS reparsed_us
    FROM events
    """,
)
def _func_dt(spark, sf_dir):
    """datetime funcs (C7-C10): RFC3339 out, epoch out, smart re-parse."""
    from omniparser_spark.functions import datetime as D

    ev = _t(spark, sf_dir, "events")
    formatted = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("rfc3339"),
        F.unix_seconds(F.date_trunc("second", F.col("ts").cast("timestamp"))).alias("epoch_s"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("epoch_ms"),
        _us(D.smart_to_timestamp(formatted)).alias("reparsed_us"),
    )


# ------------------------------------------------------------- OLAP anchors

@_q(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           (sum(l_quantity::DECIMAL(18,2))::DOUBLE) AS sum_qty,
           (sum(l_extendedprice::DECIMAL(18,2))::DOUBLE) AS sum_base,
           (sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE)
             AS sum_disc,
           round((sum(l_quantity::DECIMAL(18,2))::DOUBLE) / count(*), 6)
             AS avg_qty,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q1(spark, sf_dir):
    """TPC-H-Q1-style aggregate (filter pushdown + partial agg).

    Sums go through DECIMAL so the result is exact and independent of
    partial-aggregation order (double sums are order-dependent at the
    6th decimal; decimal sums are associative)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("sum_disc"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_qty"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "join_broadcast_enrich",
    """
    SELECT n.n_name AS nation, count(*) AS n_orders,
           (sum(o.o_totalprice::DECIMAL(18,2))::DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def _join(spark, sf_dir):
    """Broadcast-join enrichment (small dims broadcast, no shuffle of
    the fact side beyond the final agg)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@_q(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS total, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def _topk(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total"),
            "rnk",
        )
    )


@_q(
    "sessionize_events",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def _sessionize(spark, sf_dir):
    """Sessionization: lag + gap>threshold + cumulative flag sum."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _us("ts") - F.lag(_us("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# --------------------------------------------------------------- text ops

@_q(
    "text_token_count",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
             AS n_tokens
    FROM documents
    """,
)
def _tok(spark, sf_dir):
    from omniparser_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


@_q(
    "text_fingerprint",
    """
    WITH w AS (
      SELECT doc_id,
             list_transform(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007
             ) AS hs
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           list_reduce(list_prepend(0::BIGINT, hs),
                       (acc, h) -> (acc * 257 + h) % 1000000007) AS fp
    FROM w
    """,
)
def _fp(spark, sf_dir):
    from omniparser_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", fingerprint("text").alias("fp")
    )


# ------------------------------------------------------------ dedup family

@_q(
    "dedup_exact_groups",
    """
    SELECT content_hash, n_docs, doc_ids_str FROM (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS content_hash,
             count(*) AS n_docs,
             array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_str
      FROM documents GROUP BY 1
    ) WHERE n_docs > 1
    """,
)
def _dedup_exact(spark, sf_dir):
    from omniparser_spark.operators.dedup_text import exact_duplicates

    d = _t(spark, sf_dir, "documents")
    out = exact_duplicates(d)
    return out.select(
        "content_hash",
        "n_docs",
        F.array_join(F.col("doc_ids").cast("array<string>"), ",").alias(
            "doc_ids_str"
        ),
    )


def _minhash_oracle_sql(num_hashes: int = 8) -> str:
    mins = ",\n           ".join(
        f"list_min(list_transform(ws, s -> ('0x' || substr(md5('mh{i}:' || s), 1, 8))::BIGINT)) AS m{i}"
        for i in range(num_hashes)
    )
    return f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct(
               regexp_split_to_array(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
             ) AS ws
      FROM documents
      WHERE len(regexp_split_to_array(
              trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) >= 1
        AND length(trim(text)) > 0
    )
    SELECT doc_id,
           {mins}
    FROM w
    """


@_q("minhash_signature", _minhash_oracle_sql(8))
def _minhash_sig(spark, sf_dir):
    """MinHash signatures (word unigrams, 8 seeds) — oracle recomputes
    the identical md5-based min per seed in SQL."""
    from omniparser_spark.operators.dedup_text import minhash_signature

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    sig = minhash_signature(F.col("text"), num_hashes=8, k=1)
    return d.select(
        "doc_id", *[F.element_at(sig, i + 1).alias(f"m{i}") for i in range(8)]
    )


@_q(
    "ngram_jaccard_pairs",
    """
    WITH base AS (
      SELECT doc_id,
             list_distinct(ngrams) AS sh,
             len(list_distinct(ngrams)) AS n_sh
      FROM (
        SELECT doc_id,
               CASE WHEN len(ws) >= 3 THEN
                 list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
               ELSE [array_to_string(ws, ' ')] END AS ngrams
        FROM (
          SELECT doc_id,
                 regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
                   AS ws
          FROM documents WHERE length(trim(text)) > 0
        )
      )
    ),
    inv AS (
      SELECT doc_id, n_sh, unnest(sh) AS shingle FROM base
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_inter,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
      FROM inv a JOIN inv b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
    FROM inter
    WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
    """,
)
def _ngram_jac(spark, sf_dir):
    from omniparser_spark.operators.dedup_text import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, k=3, threshold=0.5)


# ----------------------------------------------------------- similarity

@_q(
    "cosine_topk_bruteforce",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(
               list_dot_product(e.embedding::DOUBLE[], q.qvec) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cos_sim
      FROM (SELECT vec_id, embedding FROM embeddings) e CROSS JOIN q
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def _cos_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (broadcast queries, JVM-side
    zip_with/aggregate dot products)."""
    from omniparser_spark.operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return cosine_topk_bruteforce(e, q, k=10)


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
