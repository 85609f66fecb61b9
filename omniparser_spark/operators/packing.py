"""Sequence packing: assemble documents into fixed token-budget
training sequences (the "pack to 4k/8k context" step of an LLM data
pipeline).

Greedy sequential first-fit within hash shards: documents are routed to
a shard (any key-aligned expression — hash of doc_id, tenant, source),
ordered deterministically within the shard, and accumulated into packs;
a document that would overflow `budget` starts the next pack. A single
document larger than the budget gets a pack of its own (callers
truncate or split upstream — flagged via `oversize`).

Why this shape at 100 TB:
- packing is embarrassingly parallel ACROSS shards and inherently
  sequential WITHIN one (each pack's start depends on every prior
  doc), so the shard count IS the parallelism knob — one shuffle to
  co-locate shards, then a per-shard Arrow-batched pass
  (``applyInPandas``); no global sort, no driver loop.
- determinism: shard assignment and in-shard order are pure functions
  of the data, so re-runs (and the DuckDB oracle) reproduce the exact
  pack ids — the property training-data reproducibility needs.
- the greedy loop is O(shard rows) python over numpy arrays inside one
  Arrow batch per shard; with shards sized ~10^5 docs the per-task
  cost is milliseconds — utterly scan-dominated. (A true bin-packing
  optimum is NP-hard and order-destroying; sequential first-fit is the
  standard practice, optionally after a length-descending pre-sort via
  `order_col`.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard: Column | None = None,
    n_shards: int = 64,
    order_col: str | None = None,
) -> DataFrame:
    """-> (id_col, shard, pack_seq, n_tokens, oversize, _ord) — one row
    per doc with its pack assignment; (shard, pack_seq) identifies a
    pack. `_ord` is the packing-order key (the `order_col` value), kept
    in the output so downstream consumers — materialize_packs above
    all — can reconstruct the exact in-pack order; drop it when not
    needed.

    `shard`: key-aligned shard expression; defaults to
    ``pmod(xxhash64(id_col), n_shards)``. `order_col`: in-shard
    packing order (default `id_col` ascending).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = order_col or id_col
    shard_expr = (
        shard
        if shard is not None
        else F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
    )
    tagged = docs.select(
        F.col(id_col),
        shard_expr.cast("long").alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(order).alias("_ord"),
    )

    id_type = tagged.schema[id_col].dataType.simpleString()
    ord_type = tagged.schema["_ord"].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, shard long, pack_seq long, "
        f"n_tokens long, oversize boolean, _ord {ord_type}"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # id_col as tiebreak: with order_col ties (e.g. the recommended
        # length-descending pre-sort) a bare stable sort would preserve
        # the NONDETERMINISTIC shuffle arrival order across runs
        pdf = pdf.sort_values(["_ord", id_col], kind="mergesort")
        toks = pdf["n_tokens"].to_numpy()
        seqs = [0] * len(toks)
        acc = 0
        seq = 0
        first = True
        for i, t in enumerate(toks):
            t = int(t)
            if not first and acc + t > budget:
                seq += 1
                acc = 0
            seqs[i] = seq
            acc += t
            first = False
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "shard": pdf["shard"],
                "pack_seq": seqs,
                "n_tokens": pdf["n_tokens"],
                "oversize": pdf["n_tokens"] > budget,
                "_ord": pdf["_ord"],
            }
        )

    return tagged.groupBy("shard").applyInPandas(pack, schema=schema)


def materialize_packs(
    docs: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Join pack assignments back to document text and emit one row per
    pack: (shard, pack_seq, pack_text, n_docs, pack_tokens) — the
    training-sequence materialization step (docs concatenated in
    packing order with `sep` between them, i.e. the EOS/document
    separator of the tokenizer downstream).

    Scale shape: one equi-join on id (broadcast-able when `packed` came
    from a filtered corpus) + one groupBy on (shard, pack_seq) with
    collect_list bounded by docs-per-pack (budget / min doc length) —
    no global sort; in-pack order is restored per group via sort_array
    on the TRUE packing key: (`_ord`, id) when `packed` carries the
    `_ord` ordering column pack_sequences emits (id alone otherwise),
    so a non-default order_col — e.g. the recommended length-descending
    pre-sort — materializes in the same order it packed."""
    j = packed.join(docs.select(id_col, text_col), id_col)
    if "_ord" in packed.columns:
        key = F.struct(
            F.col("_ord").alias("_k"),
            F.col(id_col).alias("_o"),
            F.col(text_col).alias("t"),
        )
    else:
        key = F.struct(
            F.col(id_col).alias("_o"), F.col(text_col).alias("t")
        )
    return j.groupBy("shard", "pack_seq").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(key)),
                lambda s: s.getField("t"),
            ),
            sep,
        ).alias("pack_text"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


def split_oversize(
    docs: DataFrame,
    budget: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents longer than `budget` whitespace tokens into
    word windows of at most `budget` tokens (stride = budget −
    `overlap`), so every piece fits a pack — the in-engine upstream for
    pack_sequences' `oversize` flag. Documents within budget pass
    through VERBATIM as piece 0 (original whitespace preserved); only
    oversize documents are re-tokenized into space-joined windows.

    -> (id_col, piece_idx, text_col, n_tokens), one row per piece.

    Scale shape: the same pure-array-expression machinery as
    functions/redact.py chunk_text (split → sequence of window starts →
    slice → posexplode) — shuffle-free, scan-bound, piece count per doc
    bounded by ceil(tokens/stride). The window grid covers every word:
    the last start is the final stride boundary at or before the last
    word, so trailing fragments are never dropped.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    stride = budget - overlap
    if stride <= 0:
        raise ValueError("budget must exceed overlap")
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(ws))
    starts = F.sequence(
        F.lit(0),
        F.floor((n - 1) / F.lit(stride)).cast("int") * F.lit(stride),
        F.lit(stride),
    )
    chunks = F.when(
        n <= budget, F.array(F.col(text_col))
    ).otherwise(
        F.transform(
            starts,
            lambda s: F.array_join(F.slice(ws, s + 1, F.lit(budget)), " "),
        )
    )
    return (
        docs.select(
            F.col(id_col),
            n.alias("_n"),
            F.posexplode(chunks).alias("piece_idx", text_col),
        )
        .select(
            id_col,
            "piece_idx",
            text_col,
            F.when(F.col("_n") <= budget, F.col("_n"))
            .otherwise(
                F.least(
                    F.lit(budget),
                    F.col("_n") - F.col("piece_idx") * F.lit(stride),
                )
            )
            .cast("long")
            .alias("n_tokens"),
        )
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization: (shard, pack_seq, n_docs, pack_tokens,
    fill_ratio) — the packing-efficiency monitoring aggregate (one
    map-side-combinable groupBy)."""
    return packed.groupBy("shard", "pack_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias(
            "fill_ratio"
        ),
    )
