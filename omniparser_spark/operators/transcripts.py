"""Transcript-tree and SFT-prep operators.

Chat transcripts are not flat lists: regenerations and edits branch a
conversation into a TREE of turns (each turn points at its parent; a
regenerated reply is a sibling).  Training export wants exactly one
linearized path per conversation — the canonical leaf's root-to-leaf
chain — plus, for SFT, per-turn token spans with a trainable flag so
the loss is masked to assistant turns.

The reference engine has no conversation surface at all (it is a
record-at-a-time parser); these operators are north-rule
(transcripts-axis) capabilities.  The *continuable-error* posture
mirrors the reference's taxonomy (``errs/errs.go:12-25``): malformed
trees (dangling parents) degrade per-row — a path that walks into a
missing node stops there and surfaces NULL payloads — never fail the
job.

Scale shape (100 TB):
- `tree_paths` is ONE hash shuffle on the conversation key, then pure
  column expressions: the per-conversation parent map, leaf set,
  canonical-leaf choice, and the parent-chain walk are all
  higher-order array/map functions evaluated inside whole-stage
  codegen.  No driver loop, no iterative joins, no UDF.  The walk is
  `aggregate(sequence(1, n), [leaf], prepend-parent)` — O(n^2) array
  cells per conversation, fine for the bounded (~10^2-10^3 turn)
  conversations transcripts actually have; corpora with million-node
  trees want the O(log depth) pointer-doubling join of
  `operators/clustering.py` instead (documented trade, not a cliff:
  the quadratic is per-group, so one long conversation slows only its
  own task).
- `sft_loss_mask_spans` reuses `pack_sequences` (greedy first-fit
  within hash shards — the parallelism knob) and adds one window over
  the pack partition for the running token offset.  Two shuffles
  total (conv rollup, pack co-location); the span arithmetic is
  column-only.
- `tool_call_spans` is scan-bound regexp extraction (posexplode of
  `regexp_extract_all`), shuffle-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tree_paths(
    turns: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "turn_id",
    parent_col: str = "parent_id",
    payload_cols: Sequence[str] = ("role", "text"),
) -> DataFrame:
    """Canonical root->leaf path per conversation tree.

    `turns` has one row per turn: (conv, id, parent-id-or-NULL,
    payload...).  Branches arise when two turns share a parent
    (regeneration).  The canonical leaf is the turn with the HIGHEST
    id among leaves (turns never referenced as a parent) — "latest
    regeneration wins", the standard export rule.  Returns one row per
    turn ON the canonical path: (conv, depth, id, payload...) with
    depth 0 at the root.

    Malformed input degrades per-conversation, never fails: a parent
    pointer to a missing turn ends the walk at that dangling id (its
    payload columns come back NULL); a parent cycle cannot hang — the
    walk is bounded by the conversation's turn count.
    """
    node = F.struct(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("parent"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    g = turns.groupBy(conv_col).agg(F.collect_list(node).alias("nodes"))

    ids = F.transform("nodes", lambda n: n.getField("id"))
    parents = F.transform("nodes", lambda n: n.getField("parent"))
    # parent map id -> parent (root's entry is NULL-valued, which is
    # indistinguishable from "missing" via element_at — exactly the
    # stop condition the walk wants for both)
    pmap = F.map_from_entries(
        F.transform(
            "nodes",
            lambda n: F.struct(n.getField("id"), n.getField("parent")),
        )
    )
    leaf_ids = F.filter(
        ids,
        lambda x: ~F.coalesce(F.array_contains(parents, x), F.lit(False)),
    )
    canonical = F.array_max(leaf_ids)

    # parent-chain walk: prepend head's parent until the map has no
    # entry for it. n iterations bound the walk (path length <= n), so
    # cycles and dangling parents terminate; extra iterations no-op.
    path = F.aggregate(
        F.sequence(F.lit(1), F.size("nodes")),
        F.array(canonical),
        lambda acc, _: F.when(
            F.element_at(pmap, F.element_at(acc, 1)).isNotNull(),
            F.concat(
                F.array(F.element_at(pmap, F.element_at(acc, 1))), acc
            ),
        ).otherwise(acc),
    )
    vmap = F.map_from_entries(
        F.transform(
            "nodes",
            lambda n: F.struct(
                n.getField("id"),
                F.struct(*[n.getField(c).alias(c) for c in payload_cols]),
            ),
        )
    )
    exploded = g.select(
        F.col(conv_col),
        vmap.alias("_vmap"),
        F.posexplode(path).alias("depth", id_col),
    )
    v = F.element_at(F.col("_vmap"), F.col(id_col))
    return exploded.select(
        conv_col,
        "depth",
        id_col,
        *[v.getField(c).alias(c) for c in payload_cols],
    )


def sft_loss_mask_spans(
    turns: DataFrame,
    budget: int,
    trainable: Column,
    conv_col: str = "conv_id",
    order_col: str = "turn_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 8,
    shard: Column | None = None,
) -> DataFrame:
    """Per-turn token spans with loss masks over packed sequences —
    the SFT collation step: conversations are packed whole into
    `budget`-token training sequences (greedy first-fit via
    `pack_sequences`, so packing is deterministic and shard-parallel),
    and every turn gets its [tok_start, tok_end) offset within its
    pack plus a `trainable` flag (True = contributes to the loss,
    e.g. assistant turns; False = context-only).

    `turns`: one row per turn with (conv, order, tokens, ...columns
    the `trainable` expression reads).  Conversations are never split
    across packs (a conversation larger than the budget gets its own
    oversize pack — truncate upstream).  Returns (shard, pack_seq,
    conv, order, tok_start, tok_end, trainable).
    """
    from omniparser_spark.operators.packing import pack_sequences
    from pyspark.sql import Window

    conv_tot = turns.groupBy(conv_col).agg(
        F.sum(tokens_col).cast("long").alias("_conv_tokens")
    )
    if shard is None:
        shard = F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_shards))
    packs = pack_sequences(
        conv_tot,
        budget=budget,
        tokens_col="_conv_tokens",
        id_col=conv_col,
        shard=shard,
        n_shards=n_shards,
    ).select(conv_col, "shard", "pack_seq", "oversize")
    # one shuffle to co-locate turns with their pack assignment; the
    # span offsets are a single running sum within the pack, ordered
    # by (conversation id, turn order) — the same order the packs were
    # built in, so offsets match what a sequential collator would
    # produce.
    w = (
        Window.partitionBy("shard", "pack_seq")
        .orderBy(F.col(conv_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    joined = turns.join(packs, on=conv_col, how="inner")
    tok_start = F.coalesce(
        F.sum(tokens_col).over(w), F.lit(0)
    ).cast("long")
    return joined.select(
        "shard",
        "pack_seq",
        conv_col,
        order_col,
        tok_start.alias("tok_start"),
        (tok_start + F.col(tokens_col)).cast("long").alias("tok_end"),
        trainable.alias("trainable"),
        "oversize",
    )


TOOL_CALL_RE = r'<call fn="([a-z_]+)" arg="([^"]*)"/>'


def tool_call_spans(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("turn_id",),
) -> DataFrame:
    """Structured tool-call extraction from transcript markup: every
    `<call fn="..." arg="..."/>` occurrence in `text_col` becomes one
    output row (id..., call_idx, fn, arg) in document order.  Rows
    without calls produce nothing.  Pure regexp column expressions +
    one posexplode — shuffle-free, scan-bound.
    """
    calls = F.regexp_extract_all(F.col(text_col), F.lit(TOOL_CALL_RE), 0)
    out = df.select(
        *id_cols, F.posexplode(calls).alias("call_idx", "_call")
    )
    return out.select(
        *id_cols,
        "call_idx",
        F.regexp_extract("_call", TOOL_CALL_RE, 1).alias("fn"),
        F.regexp_extract("_call", TOOL_CALL_RE, 2).alias("arg"),
    )
