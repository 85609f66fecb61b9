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
- `preference_pairs` is one window over the (conv, parent) sibling
  group + one key-partitioned self-join for the prompt text — the
  sibling groups regenerations create are tiny (2-5), so no skew.
- `truncate_context` is two window sums on the conversation key —
  one hash shuffle, column-only arithmetic.
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


def preference_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "turn_id",
    parent_col: str = "parent_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """DPO/RLHF preference-pair extraction from regeneration branches.

    Wherever a transcript tree has >=2 assistant siblings under the
    same parent (the user regenerated the reply), the LATEST sibling
    (highest id — same "latest regeneration wins" rule as
    `tree_paths`) is the implicitly-chosen response and every earlier
    sibling is an implicitly-rejected one.  Emits one row per
    (chosen, rejected) pair: (conv, parent id, prompt text = the
    parent turn's text, chosen id/text, rejected id/text,
    n_candidates in the sibling group).

    Scale shape: one window over the (conv, parent) sibling group
    (hash shuffle on the conversation key) + one self-join to fetch
    the parent turn's prompt text — both key-partitioned, no driver
    loop, no UDF.  Root turns (NULL parent) never form pairs.
    """
    from pyspark.sql import Window

    sib = (
        turns.filter(
            F.col(parent_col).isNotNull()
            & (F.col(role_col) == assistant_role)
        )
        .select(
            F.col(conv_col).alias("_conv"),
            F.col(parent_col).alias("_parent"),
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_text"),
        )
    )
    grp = Window.partitionBy("_conv", "_parent")
    ranked = sib.select(
        "*",
        F.max("_id").over(grp).alias("_chosen_id"),
        F.count(F.lit(1)).over(grp).alias("n_candidates"),
    )
    chosen = ranked.filter(F.col("_id") == F.col("_chosen_id")).select(
        "_conv", "_parent", "_chosen_id",
        F.col("_text").alias("chosen_text"), "n_candidates",
    )
    rejected = ranked.filter(F.col("_id") != F.col("_chosen_id")).select(
        "_conv", "_parent",
        F.col("_id").alias("rejected_id"),
        F.col("_text").alias("rejected_text"),
    )
    prompts = turns.select(
        F.col(conv_col).alias("_conv"),
        F.col(id_col).alias("_parent"),
        F.col(text_col).alias("prompt_text"),
    )
    pairs = rejected.join(chosen, on=["_conv", "_parent"], how="inner").join(
        prompts, on=["_conv", "_parent"], how="left"
    )
    return pairs.select(
        F.col("_conv").alias(conv_col),
        F.col("_parent").alias("parent_id"),
        "prompt_text",
        F.col("_chosen_id").alias("chosen_id"),
        "chosen_text",
        "rejected_id",
        "rejected_text",
        "n_candidates",
    )


def truncate_context(
    turns: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tokens_col: str = "n_tokens",
    keep_first: int = 1,
) -> DataFrame:
    """Context-window truncation for linearized conversations: keep the
    SUFFIX of turns whose cumulative tokens (counted from the newest
    turn backwards) fit `budget`, always additionally keeping the
    first `keep_first` turns (the system prompt) regardless of budget
    — the standard chat-serving / training-window rule.

    Returns the input rows plus `kept` (boolean) and `conv_tokens_kept`
    (total tokens the conversation retains).  A single oversized turn
    at the tail is still kept (the window always contains the newest
    turn); the budget bounds everything OLDER than it.

    Scale shape: two window sums over the conversation key — one
    reverse running sum for the suffix rule, one conditional sum for
    the report column.  One hash shuffle, column-only arithmetic.
    """
    from pyspark.sql import Window

    w_rev = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy(conv_col).orderBy(F.col(order_col))
    suffix_tokens = F.sum(tokens_col).over(w_rev).cast("long")
    rank = F.row_number().over(w_rank)
    # newest turn always kept: its suffix sum is its own size, which
    # may exceed the budget — the <= comparison is against the sum
    # *including* the turn, so guard with rank-from-end == 1.
    rank_end = F.row_number().over(
        Window.partitionBy(conv_col).orderBy(F.col(order_col).desc())
    )
    kept = (
        (suffix_tokens <= budget) | (rank <= keep_first) | (rank_end == 1)
    )
    out = turns.select(
        "*",
        kept.alias("kept"),
        suffix_tokens.alias("_sfx"),
    )
    w_all = Window.partitionBy(conv_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.select(
        *turns.columns,
        "kept",
        F.sum(F.when(F.col("kept"), F.col(tokens_col)).otherwise(0))
        .over(w_all)
        .cast("long")
        .alias("conv_tokens_kept"),
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


def explode_sft_examples(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tokens_col: str = "n_tokens",
    assistant_role: str = "assistant",
    sep: str = "\n",
    with_text: bool = True,
) -> DataFrame:
    """Per-assistant-turn example explosion — the standard SFT unroll:
    every assistant turn becomes one training example whose input is
    ALL preceding turns and whose target is the turn itself, so an
    n-turn conversation yields one example per assistant reply (each
    with a progressively longer context) instead of a single
    last-turn example.

    Returns one row per assistant turn: (conv, target order,
    context_turns, context_tokens, target_tokens, total_tokens
    [, context_text — the '\\n'-joined "role: text" transcript of the
    context]).  Compose with `truncate_context` upstream when contexts
    must fit a window budget.

    Scale shape: ONE hash shuffle on the conversation key; counts and
    token sums are running window sums (column-only).  `context_text`
    materializes O(n^2) characters per n-turn conversation — inherent
    to the unroll itself (each example repeats its prefix), fine for
    the ~10^2-turn conversations transcripts actually have, and the
    quadratic is per-group (one long conversation slows only its own
    task).  Pass `with_text=False` to emit spans-only rows (the
    collator then slices a packed token buffer, as
    `sft_loss_mask_spans` does) when the corpus has outlier-length
    conversations.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    ctx_turns = F.count(F.lit(1)).over(w).cast("int")
    ctx_tokens = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    cols = [
        F.col(conv_col),
        F.col(order_col),
        ctx_turns.alias("context_turns"),
        ctx_tokens.alias("context_tokens"),
        F.col(tokens_col).cast("long").alias("target_tokens"),
        (ctx_tokens + F.col(tokens_col)).cast("long").alias("total_tokens"),
    ]
    if with_text:
        piece = F.concat_ws(": ", F.col(role_col), F.col(text_col))
        cols.append(
            F.array_join(F.collect_list(piece).over(w), sep)
            .alias("context_text")
        )
    return (
        turns.select(*cols, F.col(role_col).alias("_role"))
        .filter(F.col("_role") == assistant_role)
        .drop("_role")
    )


def best_of_n(
    turns: DataFrame,
    score: Column,
    conv_col: str = "conv_id",
    id_col: str = "turn_id",
    parent_col: str = "parent_id",
    candidate_filter: Column | None = None,
) -> DataFrame:
    """Best-of-N rejection sampling over regeneration siblings: turns
    sharing (conversation, parent) are alternative generations of the
    same reply; keep the highest-`score` candidate per sibling group
    (ties break on the LOWEST id — the earliest generation — so the
    winner is deterministic).  The complement of `preference_pairs`:
    that exports (chosen, rejected) pairs for DPO, this keeps only the
    winner for SFT.

    Returns the winning rows with `n_candidates` (sibling-group size)
    and `score`.  `candidate_filter` restricts which rows compete
    (e.g. role == 'assistant'); non-candidates are dropped entirely.

    Scale shape: one window over the (conv, parent) sibling key —
    regeneration groups are tiny (2-5), so no skew; one hash shuffle.
    """
    from pyspark.sql import Window

    if candidate_filter is not None:
        turns = turns.filter(candidate_filter)
    grp = F.coalesce(F.col(parent_col), F.lit(-1))
    w = Window.partitionBy(conv_col, grp)
    w_rank = w.orderBy(F.col("_score").desc(), F.col(id_col).asc())
    scored = turns.withColumn("_score", score)
    return (
        scored.select(
            "*",
            F.row_number().over(w_rank).alias("_rk"),
            F.count(F.lit(1)).over(w).cast("int").alias("n_candidates"),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .withColumnRenamed("_score", "score")
    )


def conversation_lint(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    opening_roles: Sequence[str] = ("system", "user"),
) -> DataFrame:
    """Conversation-structure validation — the transcript analogue of
    the reference's record-level error taxonomy (``errs/errs.go:12-25``
    posture: degrade per-row/per-group, never fail the job).  Emits one
    row per conversation with independent boolean flags so a curation
    funnel can filter or route on each:

    - `alternation_ok`: no two consecutive turns share a role;
    - `starts_ok`: the first turn's role is in `opening_roles`;
    - `nonempty_ok`: every turn has non-blank text;
    - `contiguous_ok`: turn orders are exactly 0..n-1 (no gaps, no
      duplicates);
    - `ok`: the conjunction.

    Turns are ordered by (`order_col`, `role_col`, `text_col`) so the
    verdict is deterministic even when a malformed conversation
    duplicates an order value (such duplicates already fail
    `contiguous_ok`; the extra sort keys only stabilize which
    adjacency the alternation check sees).

    Scale shape: one lag window + one groupBy on the SAME conversation
    key — the groupBy reuses the window's hash partitioning, so the
    whole lint is a single shuffle with map-side-combinable boolean
    aggregates.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(
        order_col, role_col, text_col
    )
    flagged = turns.select(
        F.col(conv_col),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(role_col).alias("_role"),
        F.col(text_col).alias("_text"),
        F.lag(role_col).over(w).alias("_prev_role"),
        F.row_number().over(w).alias("_rn"),
    )
    return flagged.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.every(
            F.col("_prev_role").isNull()
            | (F.col("_role") != F.col("_prev_role"))
        ).alias("alternation_ok"),
        F.every(
            (F.col("_rn") != 1)
            | F.col("_role").isin(*opening_roles)
        ).alias("starts_ok"),
        F.every(
            F.col("_text").isNotNull()
            & (F.length(F.trim(F.col("_text"))) > 0)
        ).alias("nonempty_ok"),
        (
            (F.min("_ord") == 0)
            & (F.max("_ord") == F.count(F.lit(1)) - 1)
            & (F.count_distinct(F.col("_ord")) == F.count(F.lit(1)))
        ).alias("contiguous_ok"),
    ).select(
        conv_col,
        "n_turns",
        "alternation_ok",
        "starts_ok",
        "nonempty_ok",
        "contiguous_ok",
        (
            F.col("alternation_ok") & F.col("starts_ok")
            & F.col("nonempty_ok") & F.col("contiguous_ok")
        ).alias("ok"),
    )


def tree_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "turn_id",
    parent_col: str = "parent_id",
) -> DataFrame:
    """Per-conversation tree-shape profile — the observability
    companion to `tree_paths`/`preference_pairs`: how branched is the
    corpus, and how much regeneration signal (DPO pair supply) does
    each conversation carry?

    Returns one row per conversation: `n_turns`, `n_roots` (parentless
    turns — a well-formed conversation has exactly 1), `n_leaves`
    (turns no other turn points at), `n_branch_points` (parents with
    >= 2 children), `n_regens` (sum of children-1 over parents — the
    number of sibling alternatives regeneration created), and
    `max_siblings` (largest sibling group).

    Scale shape: one groupBy on (conv, parent) for the sibling-group
    profile, one left-anti-style join back on the conversation key for
    the leaf count, then a conv-key rollup — every shuffle is on the
    conversation-key family, no global operation.
    """
    sib = (
        turns.filter(F.col(parent_col).isNotNull())
        .groupBy(conv_col, F.col(parent_col).alias("_p"))
        .agg(F.count(F.lit(1)).alias("_n_children"))
    )
    per_conv_sib = sib.groupBy(conv_col).agg(
        F.sum(F.when(F.col("_n_children") >= 2, 1).otherwise(0))
        .cast("int")
        .alias("n_branch_points"),
        F.sum(F.col("_n_children") - 1).cast("int").alias("n_regens"),
        F.max("_n_children").cast("int").alias("max_siblings"),
    )
    leaves = turns.join(
        sib.select(conv_col, F.col("_p").alias(id_col)).withColumn(
            "_is_parent", F.lit(True)
        ),
        on=[conv_col, id_col],
        how="left",
    )
    base = leaves.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.sum(F.when(F.col(parent_col).isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_roots"),
        F.sum(F.when(F.col("_is_parent").isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_leaves"),
    )
    return base.join(per_conv_sib, on=conv_col, how="left").select(
        conv_col,
        "n_turns",
        "n_roots",
        "n_leaves",
        F.coalesce("n_branch_points", F.lit(0)).alias("n_branch_points"),
        F.coalesce("n_regens", F.lit(0)).alias("n_regens"),
        F.coalesce("max_siblings", F.lit(0)).alias("max_siblings"),
    )


def trajectory_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    ts_col: str = "ts",
    failed: Column | None = None,
) -> DataFrame:
    """Agent-trajectory profiling: per-conversation tool-use and
    pacing statistics — the health metrics an agent-transcript
    curation pass filters on (tool-spam loops, stalled sessions,
    failing trajectories).

    Per conversation:
    - ``n_turns``, ``n_tool_calls`` (turns carrying a tool),
      ``n_distinct_tools``;
    - ``max_tool_streak`` — the longest run of CONSECUTIVE tool turns
      (a long streak is the classic runaway-agent loop signal),
      computed with the gaps-and-islands trick: among tool turns,
      ``turn_idx - row_number()`` is constant within a consecutive
      run, so one count per (conv, island) + one max collapses it —
      no iterative logic;
    - ``first_tool_turn`` — NULL for tool-free conversations;
    - ``n_tool_failures`` — turns matching the caller's `failed`
      predicate (an engine-agnostic Column, e.g. a status column or a
      text prefix), 0 when not supplied;
    - ``duration_us`` (last ts - first ts, epoch micros) and
      ``mean_gap_us`` (integer mean inter-turn latency) — integer
      microseconds end to end, no float drift.

    Scale shape: every window/aggregate keys on the conversation-key
    family (conv, or conv+island), so the whole profile is ONE
    shuffle family; islands are derived from the per-conv turn order,
    never a global sort.
    """
    from pyspark.sql import Window

    fail = failed if failed is not None else F.lit(False)
    base = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.count(F.col(tool_col)).cast("int").alias("n_tool_calls"),
        F.count_distinct(F.col(tool_col)).cast("int").alias(
            "n_distinct_tools"
        ),
        F.min(
            F.when(F.col(tool_col).isNotNull(), F.col(order_col))
        ).cast("int").alias("first_tool_turn"),
        F.sum(F.when(fail, 1).otherwise(0)).cast("int").alias(
            "n_tool_failures"
        ),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("duration_us"),
    ).withColumn(
        "mean_gap_us",
        F.when(
            F.col("n_turns") > 1,
            F.expr("duration_us DIV (n_turns - 1)"),
        ).otherwise(F.lit(0).cast("long")),
    )
    islands = (
        turns.filter(F.col(tool_col).isNotNull())
        .select(conv_col, F.col(order_col).alias("_o"))
        .withColumn("_grp", F.col("_o") - F.row_number().over(
            Window.partitionBy(conv_col).orderBy("_o")
        ))
        .groupBy(conv_col, "_grp")
        .agg(F.count(F.lit(1)).alias("_len"))
        .groupBy(conv_col)
        .agg(F.max("_len").cast("int").alias("max_tool_streak"))
    )
    return base.join(islands, conv_col, "left").withColumn(
        "max_tool_streak",
        F.coalesce(F.col("max_tool_streak"), F.lit(0)),
    )


def tool_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-transition profile: how often the agent follows tool A
    with tool B (consecutive TOOL-BEARING turns within a
    conversation; the first tool of a conversation transitions from
    the sentinel ``<start>``). The corpus-level (from_tool, to_tool,
    n) matrix is the behavioral fingerprint used to spot degenerate
    policies (e.g. search->search->search loops) and to stratify
    trajectory sampling.

    One lag window over tool turns keyed by conversation + one
    count aggregate keyed by the (bounded) tool-pair domain — the
    corpus never shuffles twice, and the output is at most
    |tools|^2 + |tools| rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(order_col)
    t = (
        turns.filter(F.col(tool_col).isNotNull())
        .select(
            conv_col,
            F.col(order_col),
            F.col(tool_col).alias("to_tool"),
        )
        .withColumn(
            "from_tool",
            F.coalesce(
                F.lag("to_tool").over(w), F.lit("<start>")
            ),
        )
    )
    return (
        t.groupBy("from_tool", "to_tool")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def segment_sessions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Split long-running conversations into SESSIONS at idle gaps —
    the batch twin of the streaming sessionizer, for transcript
    corpora where one conv_id spans days of agent activity and
    training examples should not cross a cold boundary.

    Adds ``session_idx`` (0-based per conversation): a new session
    starts where the gap to the previous turn exceeds `gap_seconds`.
    One lag + one running-sum window on the same (conv, order) key —
    a single shuffle, no iteration.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(order_col)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    new_session = F.when(
        gap > gap_seconds * 1_000_000, 1
    ).otherwise(0)
    return turns.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("int"),
    )


def session_stats(
    sessioned: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(conversation, session) rollup over a
    :func:`segment_sessions` frame: turn count, span in integer
    micros, and first/last turn indexes. One groupBy on the
    conversation-key family."""
    return sessioned.groupBy(conv_col, "session_idx").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.min("turn_idx").cast("int").alias("first_turn"),
        F.max("turn_idx").cast("int").alias("last_turn"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("span_us"),
    )
