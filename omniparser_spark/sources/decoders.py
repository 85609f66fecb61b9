"""Vectorized per-format payload decoders with a `format` dispatch column.

This is the Spark-first re-imagining of omniparser's ``FileFormat``
probing (reference: ``extensions/omniv21/schemahandler.go:88-97``): the
reference probes 7 formats in fixed order per *stream*; here every
change event carries a ``format`` column and a single ``when()``
dispatch selects the decoded struct per *row* — one scan, zero
shuffles, whole-stage codegen throughout, because all four decoders are
built-in JVM expressions:

- json   → ``from_json``        (reference: ``idr/jsonreader.go``)
- csv    → ``from_csv``         (reference: ``fileformat/flatfile/csv/reader.go``,
                                 quote handling ``replace_double_quotes`` decl.go:14-165)
- xmlish → ``from_xml``         (reference: ``idr/xmlreader.go`` — attributes
                                 as nodes; here attributePrefix mapping)
- fixed  → ``substring`` slices (reference: ``fileformat/flatfile/fixedlength/decl.go:34-55``
                                 — 1-based *rune* positions; Spark substring is
                                 code-point-based on strings, matching Go runes)

Per-record parse failures are **continuable** (reference error taxonomy:
``errs/errs.go:12-25``): a row that fails to decode gets ``_ok=false``
and an ``_error`` message, and flows to the quarantine/dead-letter side
of the pipeline instead of failing the batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniparser_spark.sources.changefeed import FIXED_LAYOUT

# Canonical decoded turn schema (BASELINE.json input_hint), pre-cast.
TURN_FIELDS = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.StringType()),  # RFC3339 string at decode; cast in normalize
]

_DECODE_STRUCT = T.StructType(
    [T.StructField(n, t, True) for n, t in TURN_FIELDS]
)

RFC3339_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def _json_decoder(payload: Column) -> Column:
    return F.from_json(payload, _DECODE_STRUCT)


def _csv_decoder(payload: Column) -> Column:
    # pipe-delimited, RFC-4180 double-quote escaping — matches the
    # csv2 fixture (FIXTURES.md §2b). `mode=PERMISSIVE` keeps bad rows
    # as nulls (continuable error, not batch failure).
    schema_ddl = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    return F.from_csv(
        payload,
        F.lit(schema_ddl),
        {"sep": "|", "quote": '"', "escape": '"', "mode": "PERMISSIVE"},
    )


def _xml_decoder(payload: Column) -> Column:
    # attributes conv_id/idx + child elements; from_xml handles entity
    # unescaping, attribute extraction, missing-element → null.
    xml_schema = T.StructType(
        [
            T.StructField("_conv_id", T.StringType(), True),
            T.StructField("_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.StringType(), True),
        ]
    )
    parsed = F.from_xml(payload, xml_schema, {"attributePrefix": "_"})
    return F.struct(
        parsed.getField("_conv_id").alias("conv_id"),
        parsed.getField("_idx").alias("turn_idx"),
        parsed.getField("role").alias("role"),
        parsed.getField("text").alias("text"),
        parsed.getField("tool").alias("tool"),
        parsed.getField("ts").alias("ts"),
    )


def _fixed_decoder(payload: Column) -> Column:
    # 1-based rune slicing per FIXED_LAYOUT; trailing-pad trim is the
    # default trim policy (reference transform/value.go:84-89).
    fields = []
    for name, start, length in FIXED_LAYOUT:
        raw = F.substring(payload, start, length)
        val = F.rtrim(raw)
        if name == "turn_idx":
            fields.append(F.trim(raw).try_cast("int").alias(name))
        else:
            fields.append(val.alias(name))
    return F.struct(*fields)


# ---------------------------------------------------------- XML namespaces
#
# The reference resolves namespace prefixes on elements and attributes
# while streaming (idr/xmlreader.go:142-152) and tags nodes with
# XMLSpecific{NamespacePrefix, NamespaceURI} (idr/xmlnode.go:4-7).
# Payload-level equivalent, pure column expressions: extract the
# prefix->URI map from xmlns declarations, then strip prefixes so
# from_xml matches by *local name* (the xpath local-name() semantics
# the reference's queries rely on). Safe on payload XML because text
# content is entity-escaped — a raw '<' cannot appear outside markup.

def xml_namespace_map(payload: Column) -> Column:
    """map<prefix, uri> of all xmlns:prefix="uri" declarations."""
    decl = r'xmlns:([A-Za-z_][\w.-]*)="([^"]*)"'
    return F.map_from_arrays(
        F.regexp_extract_all(payload, F.lit(decl), F.lit(1)),
        F.regexp_extract_all(payload, F.lit(decl), F.lit(2)),
    )


def xml_root_prefix(payload: Column) -> Column:
    """Namespace prefix of the root element ('' when unprefixed)."""
    return F.regexp_extract(payload, r"^\s*<([A-Za-z_][\w.-]*):", 1)


def xml_strip_namespaces(payload: Column) -> Column:
    """Drop xmlns declarations and prefixes from tags and attributes,
    leaving local names (what from_xml's schema matches)."""
    c = F.regexp_replace(payload, r'\s+xmlns(:[A-Za-z_][\w.-]*)?="[^"]*"', "")
    c = F.regexp_replace(c, r"(</?)[A-Za-z_][\w.-]*:", r"$1")
    c = F.regexp_replace(c, r"(\s)[A-Za-z_][\w.-]*:(?=[\w.-]+=)", r"$1")
    return c


def _xmlns_decoder(payload: Column) -> Column:
    """Namespace-aware variant of the xmlish decoder: resolve + strip
    prefixes, then decode by local name."""
    return _xml_decoder(xml_strip_namespaces(payload))


# ----------------------------------------------------------- charsets
#
# The reference decodes utf-8, iso-8859-1 and windows-1252 input
# streams (header/header.go:14-42 via ianaindex lookup). Spark's
# built-in decode() covers UTF-8 and ISO-8859-1; windows-1252 differs
# from latin-1 ONLY in 0x80-0x9F, where cp1252 places printable
# punctuation instead of C1 controls — a single translate() after a
# latin-1 decode reproduces it exactly, still whole-stage codegen.

# bytes 0x81/0x8D/0x8F/0x90/0x9D are undefined in cp1252 — left as-is
_CP1252_DEFINED = [
    b for b in range(0x80, 0xA0) if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
]
_CP1252_FROM = "".join(chr(b) for b in _CP1252_DEFINED)
_CP1252_TO = "".join(bytes([b]).decode("cp1252") for b in _CP1252_DEFINED)


def decode_charset(binary: Column, charset: str) -> Column:
    """Decode bytes to string for the reference's charset inventory:
    'utf-8' | 'iso-8859-1' | 'windows-1252'."""
    cs = charset.lower()
    if cs in ("utf-8", "utf8"):
        return F.decode(binary, "UTF-8")
    if cs in ("iso-8859-1", "latin-1", "latin1"):
        return F.decode(binary, "ISO-8859-1")
    if cs in ("windows-1252", "cp1252"):
        return F.translate(
            F.decode(binary, "ISO-8859-1"), _CP1252_FROM, _CP1252_TO
        )
    raise ValueError(f"unsupported charset: {charset}")


# --------------------------------------------- multi-char CSV delimiters
#
# The reference's csv2 delimiter is multi-rune-safe
# (fileformat/flatfile/csv/decl.go:14-165) — Spark's from_csv `sep` is
# single-char only, so multi-char delimiters get a quote-aware regexp
# split instead: split on the delimiter only when an EVEN number of
# quotes lies ahead (i.e. we are outside a quoted field), then unquote
# + fold doubled quotes. Pure JVM expressions.

def split_delimited(
    payload: Column, sep: str, quote: str | None = '"'
) -> Column:
    """array<string> of fields; `sep` may be any length. RFC-4180-ish:
    fields may be quoted, delimiters inside quotes are data, doubled
    quotes unescape. `quote=None` for a plain split."""
    import re as _re

    if not quote:
        return F.split(payload, _re.escape(sep))
    q = _re.escape(quote)
    pat = _re.escape(sep) + f"(?=(?:[^{q}]*{q}[^{q}]*{q})*[^{q}]*$)"
    parts = F.split(payload, pat)

    def unquote(p: Column) -> Column:
        inner = p.substr(F.lit(2), F.length(p) - 2)
        return F.when(
            (F.length(p) >= 2)
            & F.startswith(p, F.lit(quote))
            & F.endswith(p, F.lit(quote)),
            F.replace(inner, F.lit(quote + quote), F.lit(quote)),
        ).otherwise(p)

    return F.transform(parts, unquote)


# ------------------------------------------- legacy CSV header verification

def verify_csv_header(
    lines: DataFrame,
    declared_cols: list[str],
    sep: str = ",",
    header_row_index: int = 1,
    file_col: str = "file_id",
    order_col: str = "line_no",
    line_col: str = "line",
):
    """Pre-flight header-row assertion (reference legacy csv:
    fileformat/csv/reader.go:41-126 errors when the header row does not
    match the declared column names / aliases).

    Returns (data_rows, quarantine): files whose header row splits
    exactly to `declared_cols` keep their data rows (line_no >
    header_row_index); files with a missing or mismatching header are
    quarantined whole, with a ctx-aware error naming the file and the
    offending header. The header set is one row per file — broadcast
    to the data-row join, so the verification adds no shuffle.
    """
    import re as _re

    got = F.split(F.col(line_col), _re.escape(sep))
    headers = (
        lines.filter(F.col(order_col) == header_row_index)
        .select(
            F.col(file_col),
            got.alias("_got"),
            (got == F.array(*[F.lit(c) for c in declared_cols])).alias("_hdr_ok"),
        )
    )
    joined = lines.join(F.broadcast(headers), file_col, "left")
    ok = F.coalesce(F.col("_hdr_ok"), F.lit(False))
    data = joined.filter(ok & (F.col(order_col) > header_row_index)).drop(
        "_got", "_hdr_ok"
    )
    quarantine = joined.filter(~ok).select(
        file_col,
        order_col,
        line_col,
        F.concat(
            F.lit("header mismatch in file "),
            F.col(file_col).cast("string"),
            F.lit(": expected ["),
            F.lit(",".join(declared_cols)),
            F.lit("] got ["),
            F.coalesce(F.array_join("_got", ","), F.lit("<no header row>")),
            F.lit("]"),
        ).alias("error"),
    )
    return data, quarantine


_DECODERS = {
    "json": _json_decoder,
    "csv": _csv_decoder,
    "xmlish": _xml_decoder,
    "xmlish_ns": _xmlns_decoder,
    "fixed": _fixed_decoder,
}


def register_format(name: str, decoder) -> None:
    """Custom file-format plug-in (reference ``FileFormat``/``FormatReader``
    interfaces, fileformat/fileformat.go:12-41; sample plug-in
    ``samples/customfileformats/jsonlog``): a decoder is any callable
    ``payload: Column -> Column`` producing the TURN_FIELDS struct.
    Registered formats participate in the same per-format dispatch as
    the built-ins — one filtered branch, unioned, zero shuffles."""
    _DECODERS[name] = decoder


# Binary wire-format plug-ins (Confluent-framed protobuf/Avro): these
# cannot be column expressions (varint-framed binary needs an imperative
# parser), so a frame decoder is a DataFrame-level transform
# ``(df, payload_col) -> df + `turn` column`` — in practice a
# mapInPandas over Arrow batches. It must append `turn` typed exactly
# _DECODE_STRUCT (None for a bad frame: the shared ok/err gate below
# then quarantines the row) and pass every envelope column through
# unchanged, so the branch unions with the expression branches
# position-compatibly. Registration is explicit (e.g.
# sources/proto_wire.register_proto_format()), mirroring
# register_format's plug-in posture.
_FRAME_DECODERS: dict[str, object] = {}


def register_frame_format(name: str, frame_decoder) -> None:
    _FRAME_DECODERS[name] = frame_decoder


def decode_payload(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach a decoded `turn` struct column via per-format dispatch.

    Input must have `format` and `payload` columns. Output adds:
    `turn` (struct), `_ok` (bool), `_error` (string or null).

    Dispatch is **filter + union per format**, not a single ``when()``
    chain: Catalyst inlines a when() of four parser expressions into
    every downstream field extraction, multiplying plan size by
    (#fields x #formats) and ballooning codegen (observed 9 MiB task
    binaries, ~50x slowdown). With one branch per format each plan
    carries exactly one parser, the filter prunes rows before parsing,
    and the union is a zero-shuffle concatenation of partitions.
    """
    p = F.col(payload_col)
    branches = [
        df.filter(F.col("format") == fmt).withColumn("turn", dec(p))
        for fmt, dec in _DECODERS.items()
    ]
    for fmt, fdec in _FRAME_DECODERS.items():
        branches.append(fdec(df.filter(F.col("format") == fmt), payload_col))
    known = [*_DECODERS, *_FRAME_DECODERS]
    unknown = df.filter(
        F.col("format").isNull() | ~F.col("format").isin(*known)
    ).withColumn("turn", F.lit(None).cast(_DECODE_STRUCT))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    df = out.unionAll(unknown)
    ok = (
        F.col("turn").isNotNull()
        & F.col("turn.conv_id").isNotNull()
        & (F.length("turn.conv_id") > 0)
        & F.col("turn.turn_idx").isNotNull()
    )
    err = F.when(
        ~ok,
        F.concat(
            F.lit("decode failed: format="),
            F.coalesce(F.col("format"), F.lit("?")),
            F.lit(" offset="),
            F.col("offset").cast("string"),
        ),
    )
    return df.withColumn("_ok", ok).withColumn("_error", err)
