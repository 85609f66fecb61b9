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
) -> tuple[DataFrame, DataFrame]:
    """lines(file_col, order_col, ...) -> (records, quarantine).

    records: one row per parent with `parent` (struct of the parent
    line's columns) and `children` (array<struct> in line order).
    quarantine: groups violating min/max occurs, plus orphan children
    appearing before any parent (ErrUnexpectedData analogue).
    """
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

    records = grouped.filter(~bad).select(
        file_col, F.col("_parent_seq").alias("record_seq"), "parent", "children",
        "n_children",
    )
    quarantine = grouped.filter(bad).select(
        file_col,
        F.col("_parent_seq").alias("record_seq"),
        "n_children",
        F.when(orphan, "unexpected data before first parent record")
        .when(too_few, f"fewer than min_occurs={min_children} children")
        .otherwise("more than max_occurs children")
        .alias("error"),
    )
    return records, quarantine


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
