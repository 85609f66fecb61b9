"""Hierarchical record assembly: flat line streams -> nested records.

The reference assembles hierarchical records with a stack machine over
the input stream (``fileformat/flatfile/hierarchyReader.go:50-272``):
record decls match lines (by pattern/prefix), children attach to the
nearest preceding parent, and ``min_occurs``/``max_occurs`` are
enforced (``ErrFewerThanMinOccurs`` / ``ErrUnexpectedData``).

The distributed re-expression is **sessionize-and-nest**:

1. tag each line with its record type (pattern match — column exprs);
2. assign every line the *sequence number of the most recent parent
   marker* via a running count window within the file — this is the
   stack machine's "current parent" state, expressed as a prefix sum;
3. group by (file, parent_seq) and assemble parent + collect_list of
   children (order-stable via sort on line_no);
4. occurs-validation becomes per-group count checks that route bad
   groups to a quarantine side, mirroring the continuable-error
   contract.

The only shuffle is the final groupBy on (file_id, parent_seq) — the
window in (2) partitions by file_id, which is the natural parallelism
unit for multi-file ingest (the reference parallelizes exactly the
same way: one stream per file, SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assemble_parent_child(
    lines: DataFrame,
    is_parent: Column,
    file_col: str = "file_id",
    order_col: str = "line_no",
    min_children: int = 0,
    max_children: int | None = None,
    type_col: str | None = None,
    occurs_by_type: dict[str, tuple[int, int | None]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """lines(file_col, order_col, ...) -> (records, quarantine).

    records: one row per parent with `parent` (struct of the parent
    line's columns) and `children` (array<struct> in line order).
    quarantine: groups violating min/max occurs, plus orphan children
    appearing before any parent (ErrUnexpectedData analogue).

    `occurs_by_type` enforces the reference's per-record-type
    min/max_occurs (one bound per decl node, hierarchyReader.go:50-272,
    edi seg.go min/max): keys are values of `type_col`, values are
    (min, max-or-None) checked per group with pure array expressions —
    e.g. ``{"D": (1, 5), "N": (0, 1)}``.
    """
    if occurs_by_type and not type_col:
        raise ValueError("occurs_by_type requires type_col")
    payload_cols = [c for c in lines.columns if c not in (file_col, order_col)]
    w = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = lines.withColumn("_is_parent", is_parent).withColumn(
        "_parent_seq", F.sum(F.col("_is_parent").cast("int")).over(w)
    )

    packed = F.struct(*[F.col(c) for c in payload_cols])
    grouped = tagged.groupBy(file_col, "_parent_seq").agg(
        F.max_by(packed, F.when(F.col("_is_parent"), F.col(order_col))).alias(
            "parent"
        ),
        F.sort_array(
            F.collect_list(
                F.when(
                    ~F.col("_is_parent"),
                    F.struct(F.col(order_col).alias("_ord"), packed.alias("rec")),
                )
            )
        ).alias("_kids"),
        F.count(F.when(~F.col("_is_parent"), 1)).alias("n_children"),
    )
    grouped = grouped.withColumn(
        "children", F.transform(F.col("_kids"), lambda k: k.getField("rec"))
    ).drop("_kids")

    orphan = F.col("_parent_seq") == 0  # children before any parent
    too_few = F.col("n_children") < min_children
    too_many = (
        F.col("n_children") > max_children if max_children is not None else F.lit(False)
    )
    bad = orphan | too_few | too_many
    err = (
        F.when(orphan, "unexpected data before first parent record")
        .when(too_few, f"fewer than min_occurs={min_children} children")
        .when(too_many, "more than max_occurs children")
    )

    for rec_type, (mn, mx) in (occurs_by_type or {}).items():
        n_t = F.size(
            F.filter(
                F.col("children"),
                lambda c: c.getField(type_col) == rec_type,  # noqa: B023
            )
        )
        t_few = n_t < mn
        t_many = n_t > mx if mx is not None else F.lit(False)
        bad = bad | t_few | t_many
        err = err.when(
            t_few, f"record type {rec_type!r}: fewer than min_occurs={mn}"
        ).when(
            t_many, f"record type {rec_type!r}: more than max_occurs={mx}"
        )

    records = grouped.filter(~bad).select(
        file_col, F.col("_parent_seq").alias("record_seq"), "parent", "children",
        "n_children",
    )
    quarantine = grouped.filter(bad).select(
        file_col,
        F.col("_parent_seq").alias("record_seq"),
        "n_children",
        err.alias("error"),
    )
    return records, quarantine


def assemble_envelopes(
    lines: DataFrame,
    header_pattern: str,
    footer_pattern: str,
    file_col: str = "file_id",
    order_col: str = "line_no",
    line_col: str = "line",
) -> tuple[DataFrame, DataFrame]:
    """Header/footer-regex record envelopes: every record spans from a
    line matching `header_pattern` through the next line matching
    `footer_pattern` (inclusive), mirroring the reference's
    by_header_footer envelopes (flatfile/fixedlength/reader.go:31-279,
    csv decl.go header/footer regex pairs).

    Same prefix-sum machine as :func:`assemble_parent_child`, with TWO
    running counts per file: h = headers seen up to and including this
    line, f = footers seen strictly *before* this line. A line is
    inside envelope h iff h > f; lines between a footer and the next
    header (h == f) are unexpected data.

    Returns (records, quarantine):
    - records: (file_col, record_seq, header, body array<string> in
      line order, footer, n_body) — one per *closed* envelope;
    - quarantine: out-of-envelope lines, and envelopes that never saw
      their footer (EOF or next header first — the reference's
      "missing footer" error).
    """
    w_h = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_h = F.col(line_col).rlike(header_pattern)
    is_f = F.col(line_col).rlike(footer_pattern)
    tagged = (
        lines.withColumn("_is_h", is_h)
        .withColumn("_is_f", is_f)
        .withColumn("_h", F.sum(F.col("_is_h").cast("int")).over(w_h))
        .withColumn(
            "_f",
            F.coalesce(F.sum(F.col("_is_f").cast("int")).over(w_f), F.lit(0)),
        )
    )
    outside = F.col("_h") <= F.col("_f")
    stray = tagged.filter(outside).select(
        file_col,
        F.col(order_col),
        F.lit("unexpected data outside any envelope").alias("error"),
    )
    grouped = (
        tagged.filter(~outside)
        .groupBy(file_col, F.col("_h").alias("record_seq"))
        .agg(
            F.max_by(F.col(line_col), F.when(F.col("_is_h"), F.col(order_col))).alias(
                "header"
            ),
            F.max_by(F.col(line_col), F.when(F.col("_is_f"), F.col(order_col))).alias(
                "footer"
            ),
            F.sort_array(
                F.collect_list(
                    F.when(
                        ~F.col("_is_h") & ~F.col("_is_f"),
                        F.struct(F.col(order_col).alias("_ord"), F.col(line_col).alias("ln")),
                    )
                )
            ).alias("_body"),
        )
        .withColumn("body", F.transform("_body", lambda s: s.getField("ln")))
        .withColumn("n_body", F.size("body"))
        .drop("_body")
    )
    unclosed = F.col("footer").isNull()
    records = grouped.filter(~unclosed).select(
        file_col, "record_seq", "header", "body", "footer", "n_body"
    )
    quarantine = grouped.filter(unclosed).select(
        file_col,
        F.col("record_seq").cast("long").alias(order_col),
        F.lit("envelope not closed by footer").alias("error"),
    ).unionByName(stray.select(file_col, F.col(order_col).cast("long"), "error"))
    return records, quarantine


def assemble_rows_envelope(
    lines: DataFrame,
    n_rows: int,
    file_col: str = "file_id",
    order_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Fixed `rows`-count envelopes: every `n_rows` consecutive lines of
    a file form one record (reference by_rows envelopes,
    flatfile/fixedlength/decl.go `rows`, legacy fixedlength/decl.go
    by_rows). One window to rank lines within the file, then a groupBy
    on the rank's integer division — the same single-shuffle shape as
    the other assemblers. Records with fewer than n_rows lines (file
    tail) keep a short `rows` array; callers enforce occurs if needed.

    Returns (file_col, record_seq, rows array<string> in line order,
    n_rows).
    """
    w = Window.partitionBy(file_col).orderBy(order_col)
    tagged = lines.withColumn(
        "_seq", ((F.row_number().over(w) - 1) / n_rows).cast("long")
    )
    return (
        tagged.groupBy(file_col, F.col("_seq").alias("record_seq"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("_ord"),
                        F.col(line_col).alias("ln"),
                    )
                )
            ).alias("_rows")
        )
        .withColumn("rows", F.transform("_rows", lambda s: s.getField("ln")))
        .withColumn("n_rows", F.size("rows"))
        .drop("_rows")
    )


def assemble_delimited_payload(
    df: DataFrame,
    payload_col: str = "payload",
    line_sep: str = "\n",
    parent_prefix: str = "H",
    field_sep: str = ",",
) -> DataFrame:
    """Assemble a nested record *within* one event's multi-line payload
    (the CDC-engine shape: each change event carries a whole H/D block,
    FIXTURES.md §2b nested variant) — pure array expressions, no
    shuffle at all: explode-free, window-free.

    Returns `header` (array of header fields) and `details`
    (array<array<string>> of per-line fields).
    """
    lines = F.split(F.col(payload_col), line_sep)
    parsed = F.transform(lines, lambda ln: F.split(ln, field_sep))
    is_hdr = lambda fields: fields.getItem(0) == parent_prefix  # noqa: E731
    header = F.element_at(F.filter(parsed, is_hdr), 1)
    details = F.filter(parsed, lambda fs: fs.getItem(0) != parent_prefix)
    return df.withColumn("header", header).withColumn("details", details)


def assemble_nested(
    lines: DataFrame,
    is_outer: Column,
    is_inner: Column,
    file_col: str = "file_id",
    order_col: str = "line_no",
    type_col: str | None = None,
    outer_occurs_by_type: dict[str, tuple[int, int | None]] | None = None,
    inner_occurs_by_type: dict[str, tuple[int, int | None]] | None = None,
    is_inner_member: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Two-level hierarchical assembly in ONE sort pass.

    The reference's stack machine handles arbitrarily nested record
    groups (``fileformat/flatfile/hierarchyReader.go:50-272``; EDI
    segment groups ``fileformat/edi/seg.go``) — e.g. the UPS 210
    sample's ST transaction loop containing LX charge loops.  Composing
    two :func:`assemble_parent_child` passes expresses that, but costs
    two full shuffles + three sorts of the line stream.  This operator
    is the plan you'd actually want at scale: **one exchange on
    file_col, one sort on order_col**, under which three running sums
    evaluate the whole two-level stack state per row:

    - ``_oseq``  = outer markers seen so far  (which outer group),
    - ``_iseq``  = inner markers seen so far  (global within file),
    - ``_i_at_o`` = ``_iseq`` value on the current outer marker row,

    so ``_iseq - _i_at_o`` is the inner-group ordinal *within* the
    outer group (0 = the outer record's own direct children).  Both
    group-bys key on prefixes of (file, _oseq, inner ordinal) and
    therefore reuse the window's hash partitioning — Catalyst inserts
    no further exchange (verified via .explain: a single Exchange node
    in the whole plan).

    Returns ``(outer_records, quarantine)``:

    - ``outer_records``: one row per outer group — ``parent`` (struct
      of the outer marker line), ``direct_children`` (array<struct>,
      lines before the first inner marker), ``inner_groups``
      (array<struct<parent, children, n_children>> in stream order),
      ``n_direct``, ``n_inner``.
    - ``quarantine``: orphan lines before the first outer marker, and
      groups violating the per-type occurs bounds at either level
      (``outer_occurs_by_type`` checks direct children counts per
      outer group; ``inner_occurs_by_type`` checks children counts per
      inner group), mirroring ``ErrFewerThanMinOccurs`` /
      ``ErrUnexpectedData``.
    """
    if (outer_occurs_by_type or inner_occurs_by_type) and not type_col:
        raise ValueError("occurs_by_type requires type_col")
    payload_cols = [c for c in lines.columns if c not in (file_col, order_col)]
    w = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = (
        lines.withColumn("_is_o", is_outer)
        .withColumn("_is_i", is_inner)
        .withColumn("_oseq", F.sum(F.col("_is_o").cast("int")).over(w))
        .withColumn("_iseq", F.sum(F.col("_is_i").cast("int")).over(w))
        .withColumn(
            "_i_at_o",
            F.max(F.when(F.col("_is_o"), F.col("_iseq"))).over(w),
        )
        .withColumn(
            "_is_m",
            F.lit(True) if is_inner_member is None else is_inner_member,
        )
        # stack pop: an inner group stays open only until the next row
        # that is an outer marker or NOT an inner member (the reference
        # pops the loop when a segment outside the group's child set
        # arrives, hierarchyReader.go matching) — so trailing outer
        # segments (e.g. X12 L3/SE after the last LX loop) attach to
        # the OUTER record, not the last inner group. With the default
        # all-true member predicate only outer markers close, which is
        # the plain "everything after an inner marker is loop content"
        # reading.
        .withColumn(
            "_open", F.max(F.when(F.col("_is_i"), F.col(order_col))).over(w)
        )
        .withColumn(
            "_close",
            F.max(
                F.when(F.col("_is_o") | ~F.col("_is_m"), F.col(order_col))
            ).over(w),
        )
        .withColumn(
            "_in_i",
            F.col("_is_m")
            & ~F.col("_is_o")
            & F.col("_open").isNotNull()
            & (F.col("_close").isNull() | (F.col("_open") > F.col("_close"))),
        )
        .withColumn(
            "_igrp",
            F.when(
                F.col("_in_i"),
                F.col("_iseq") - F.coalesce(F.col("_i_at_o"), F.lit(0)),
            ).otherwise(F.lit(0)),
        )
    )

    packed = F.struct(*[F.col(c) for c in payload_cols])

    # Occurs accounting rides the aggregates as plain integer counters
    # instead of post-hoc `size(filter(array))` / `exists(...)` lambdas
    # over the assembled nested arrays: each such higher-order call
    # MATERIALIZES a filtered copy of the fat child structs (full
    # nested-bytes copy per outer row per checked type — measured as
    # the dominant slice of the 1.2M-segment bench, ~2.5 s of 4.1 s at
    # local[32]), while a count(when(type=t)) in the hash aggregate is
    # a codegen'd integer add. Same numbers, same quarantine strings.
    outer_types = list((outer_occurs_by_type or {}).items())
    inner_types = list((inner_occurs_by_type or {}).items())
    count_types = sorted(
        {t for t, _ in outer_types} | {t for t, _ in inner_types}
    )
    type_counts = [
        F.count(
            F.when(
                ~F.col("_is_o")
                & ~F.col("_is_i")
                & (F.col(type_col) == t),
                1,
            )
        ).alias(f"_nt_{i}")
        for i, t in enumerate(count_types)
    ]
    type_idx = {t: i for i, t in enumerate(count_types)}

    # finest level first: one bucket per (outer group, inner ordinal);
    # ordinal 0 carries the outer marker row + its direct children
    fine = tagged.groupBy(file_col, "_oseq", "_igrp").agg(
        F.max_by(
            packed, F.when(F.col("_is_o") | F.col("_is_i"), F.col(order_col))
        ).alias("g_parent"),
        F.sort_array(
            F.collect_list(
                F.when(
                    ~F.col("_is_o") & ~F.col("_is_i"),
                    F.struct(F.col(order_col).alias("_ord"), packed.alias("rec")),
                )
            )
        ).alias("_kids"),
        F.min(order_col).alias("_first_ln"),
        *type_counts,
    )
    fine = fine.withColumn(
        "g_children", F.transform("_kids", lambda k: k.getField("rec"))
    ).drop("_kids")

    # per-type occurs aggregates, folded into the outer groupBy:
    # direct-children counts sum the ordinal-0 buckets; inner
    # violations are a bool_or over the ordinal>0 buckets' counts
    occurs_aggs = []
    for t, (mn, mx) in outer_types:
        i = type_idx[t]
        occurs_aggs.append(
            F.sum(
                F.when(F.col("_igrp") == 0, F.col(f"_nt_{i}"))
            ).alias(f"_od_{i}")
        )
    for t, (mn, mx) in inner_types:
        i = type_idx[t]
        occurs_aggs.append(
            F.max(
                F.when(F.col("_igrp") > 0, F.col(f"_nt_{i}") < mn)
            ).alias(f"_if_{i}")
        )
        if mx is not None:
            occurs_aggs.append(
                F.max(
                    F.when(F.col("_igrp") > 0, F.col(f"_nt_{i}") > mx)
                ).alias(f"_im_{i}")
            )

    # nest upward: groups are ~lines/inner_size rows, partitioning on
    # file_col is retained, so this agg shuffles nothing
    outer = fine.groupBy(file_col, "_oseq").agg(
        F.max_by("g_parent", F.when(F.col("_igrp") == 0, 1)).alias("parent"),
        F.flatten(
            F.collect_list(F.when(F.col("_igrp") == 0, F.col("g_children")))
        ).alias("direct_children"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("_igrp") > 0,
                    F.struct(
                        F.col("_first_ln").alias("_ord"),
                        F.col("g_parent").alias("parent"),
                        F.col("g_children").alias("children"),
                        F.size("g_children").alias("n_children"),
                    ),
                )
            )
        ).alias("inner_groups"),
        *occurs_aggs,
    )
    outer = (
        outer.withColumn("n_direct", F.size("direct_children"))
        .withColumn("n_inner", F.size("inner_groups"))
    )

    orphan = F.col("_oseq") == 0
    bad = orphan
    err = F.when(orphan, "unexpected data before first outer record")
    for rec_type, (mn, mx) in outer_types:
        n_t = F.coalesce(F.col(f"_od_{type_idx[rec_type]}"), F.lit(0))
        t_few = n_t < mn
        t_many = n_t > mx if mx is not None else F.lit(False)
        bad = bad | t_few | t_many
        err = err.when(
            t_few, f"outer type {rec_type!r}: fewer than min_occurs={mn}"
        ).when(t_many, f"outer type {rec_type!r}: more than max_occurs={mx}")
    for rec_type, (mn, mx) in inner_types:
        i = type_idx[rec_type]
        viol_few = F.coalesce(F.col(f"_if_{i}"), F.lit(False))
        viol_many = (
            F.coalesce(F.col(f"_im_{i}"), F.lit(False))
            if mx is not None
            else F.lit(False)
        )
        bad = bad | viol_few | viol_many
        err = err.when(
            viol_few, f"inner type {rec_type!r}: fewer than min_occurs={mn}"
        ).when(
            viol_many, f"inner type {rec_type!r}: more than max_occurs={mx}"
        )

    records = outer.filter(~bad).select(
        file_col,
        F.col("_oseq").alias("record_seq"),
        "parent",
        "direct_children",
        "inner_groups",
        "n_direct",
        "n_inner",
    )
    quarantine = outer.filter(bad).select(
        file_col,
        F.col("_oseq").alias("record_seq"),
        "n_direct",
        "n_inner",
        err.alias("error"),
    )
    return records, quarantine
