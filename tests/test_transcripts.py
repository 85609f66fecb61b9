"""Transcript-tree / SFT-prep operator edge semantics: branched trees
with dead leaves, dangling parents and cycles; pack-span contiguity and
oversize conversations; tool-call extraction order."""

from __future__ import annotations

from pyspark.sql import functions as F

from omniparser_spark.operators.transcripts import (
    preference_pairs,
    sft_loss_mask_spans,
    tool_call_spans,
    tree_paths,
    truncate_context,
)

TREE_SCHEMA = (
    "conv_id string, turn_id long, parent_id long, role string, text string"
)


def test_tree_paths_picks_latest_regeneration(spark):
    # conv A:      1 -> 2 -> 3 (dead leaf)
    #                   \-> 4 -> 5   (4 regenerates 3; leaf 5 canonical)
    rows = [
        ("A", 1, None, "user", "q"),
        ("A", 2, 1, "assistant", "a1"),
        ("A", 3, 2, "user", "dead"),
        ("A", 4, 2, "user", "q2"),
        ("A", 5, 4, "assistant", "a2"),
    ]
    df = spark.createDataFrame(rows, TREE_SCHEMA)
    out = tree_paths(df).orderBy("depth").collect()
    assert [(r.depth, r.turn_id, r.text) for r in out] == [
        (0, 1, "q"), (1, 2, "a1"), (2, 4, "q2"), (3, 5, "a2"),
    ]


def test_tree_paths_single_turn_and_multiple_convs(spark):
    rows = [
        ("A", 1, None, "user", "only"),
        ("B", 10, None, "user", "u"),
        ("B", 11, 10, "assistant", "a"),
    ]
    df = spark.createDataFrame(rows, TREE_SCHEMA)
    out = {(r.conv_id, r.depth): r.turn_id for r in tree_paths(df).collect()}
    assert out == {("A", 0): 1, ("B", 0): 10, ("B", 1): 11}


def test_tree_paths_dangling_parent_degrades_not_fails(spark):
    # leaf's parent 99 is missing: the walk ends AT the dangling id,
    # whose payload comes back NULL — continuable, not fatal
    rows = [
        ("A", 1, 99, "user", "orphan"),
    ]
    df = spark.createDataFrame(rows, TREE_SCHEMA)
    out = tree_paths(df).orderBy("depth").collect()
    assert [(r.depth, r.turn_id, r.text) for r in out] == [
        (0, 99, None), (1, 1, "orphan"),
    ]


def test_tree_paths_cycle_terminates(spark):
    # 2 <-> 3 cycle plus a genuine leaf 4 off node 2; the walk is
    # bounded by the conversation's turn count, so it must return
    rows = [
        ("A", 2, 3, "user", "x"),
        ("A", 3, 2, "user", "y"),
        ("A", 4, 2, "user", "leaf"),
    ]
    df = spark.createDataFrame(rows, TREE_SCHEMA)
    out = tree_paths(df).collect()
    assert len(out) <= 4  # bounded, no hang
    assert max(r.turn_id for r in out) == 4


def test_sft_spans_contiguous_and_oversize(spark):
    # conv 0: 3 turns x 100 tokens; conv 8 (same shard 0): 2 x 100;
    # conv 16 (shard 0): 700 tokens > budget 512 -> own oversize pack
    rows = [
        (0, 1, 100, "user"), (0, 2, 100, "assistant"), (0, 3, 100, "user"),
        (8, 1, 100, "assistant"), (8, 2, 100, "user"),
        (16, 1, 700, "assistant"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_id long, n_tokens long, role string"
    )
    out = sft_loss_mask_spans(
        df, budget=512, trainable=F.col("role") == "assistant",
        shard=F.col("conv_id") % 8, n_shards=8,
    ).collect()
    by = {(r.conv_id, r.turn_id): r for r in out}
    # convs 0 and 8 share pack 0 on shard 0 (300 + 200 <= 512)
    assert by[(0, 1)].pack_seq == by[(8, 2)].pack_seq == 0
    assert by[(16, 1)].pack_seq == 1 and by[(16, 1)].oversize
    # spans are contiguous in (conv, turn) order within the pack
    spans = sorted(
        (r.tok_start, r.tok_end) for r in out if r.pack_seq == 0
    )
    assert spans == [(0, 100), (100, 200), (200, 300), (300, 400),
                     (400, 500)]
    assert by[(0, 2)].trainable and not by[(0, 3)].trainable


def test_tool_call_spans_order_and_empty(spark):
    rows = [
        (1, 'a <call fn="s" arg="x"/> b <call fn="fetch" arg=""/> c'),
        (2, "no markup"),
        (3, '<call fn="bad arg="y"/>'),  # malformed: no match
    ]
    df = spark.createDataFrame(rows, "turn_id long, text string")
    out = tool_call_spans(df).collect()
    assert [(r.turn_id, r.call_idx, r.fn, r.arg) for r in out] == [
        (1, 0, "s", "x"), (1, 1, "fetch", ""),
    ]


def test_preference_pairs_latest_wins_and_role_filter(spark):
    rows = [
        # conv a: parent 1 (user prompt) with three assistant
        # regenerations 2, 3, 5 and one user sibling 4 (ignored)
        ("a", 1, None, "user", "prompt A"),
        ("a", 2, 1, "assistant", "draft 1"),
        ("a", 3, 1, "assistant", "draft 2"),
        ("a", 4, 1, "user", "not a candidate"),
        ("a", 5, 1, "assistant", "final"),
        # conv a: single assistant child under 5 -> no pair
        ("a", 6, 5, "assistant", "lone"),
        # conv b: root-level turns (NULL parent) never pair
        ("b", 1, None, "assistant", "r1"),
        ("b", 2, None, "assistant", "r2"),
        # conv b: pair under a parent that itself is missing from the
        # table -> pair still forms, prompt_text NULL
        ("b", 10, 7, "assistant", "x"),
        ("b", 11, 7, "assistant", "y"),
    ]
    df = spark.createDataFrame(rows, TREE_SCHEMA)
    out = preference_pairs(df).collect()
    pairs = {(r.conv_id, r.rejected_id): r for r in out}
    assert set(pairs) == {("a", 2), ("a", 3), ("b", 10)}
    ra = pairs[("a", 2)]
    assert ra.chosen_id == 5 and ra.chosen_text == "final"
    assert ra.rejected_text == "draft 1" and ra.n_candidates == 3
    assert ra.prompt_text == "prompt A"
    rb = pairs[("b", 10)]
    assert rb.chosen_id == 11 and rb.prompt_text is None


def test_truncate_context_suffix_budget(spark):
    rows = [
        # conv a: sizes 10,30,20,25 newest-last; budget 50 keeps the
        # suffix (20,25)=45 (adding 30 would hit 75) plus turn 1
        ("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("a", 4, 25),
        # conv b: single oversized newest turn is still kept
        ("b", 1, 999),
        # conv c: everything fits
        ("c", 1, 5), ("c", 2, 6),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long, n_tokens long")
    out = truncate_context(df, budget=50, keep_first=1).collect()
    kept = {(r.conv_id, r.turn_idx): r.kept for r in out}
    assert kept == {
        ("a", 1): True, ("a", 2): False, ("a", 3): True, ("a", 4): True,
        ("b", 1): True, ("c", 1): True, ("c", 2): True,
    }
    tot = {r.conv_id: r.conv_tokens_kept for r in out}
    assert tot == {"a": 55, "b": 999, "c": 11}


def test_explode_sft_examples_progressive_context(spark):
    from omniparser_spark.operators.transcripts import explode_sft_examples

    rows = [
        ("A", 0, "user", "q1", 3),
        ("A", 1, "assistant", "a1", 5),
        ("A", 2, "user", "q2", 2),
        ("A", 3, "assistant", "a2", 7),
        ("B", 0, "assistant", "solo", 4),  # no context at all
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx long, role string, text string, "
        "n_tokens long",
    )
    out = {
        (r.conv_id, r.turn_idx): r
        for r in explode_sft_examples(turns).collect()
    }
    # one example per assistant turn, context grows per example
    assert set(out) == {("A", 1), ("A", 3), ("B", 0)}
    e1 = out[("A", 1)]
    assert (e1.context_turns, e1.context_tokens, e1.target_tokens) == (1, 3, 5)
    assert e1.context_text == "user: q1"
    e2 = out[("A", 3)]
    assert (e2.context_turns, e2.context_tokens, e2.total_tokens) == (3, 10, 17)
    assert e2.context_text == "user: q1\nassistant: a1\nuser: q2"
    # zero-context example: empty string, zero counts
    e3 = out[("B", 0)]
    assert (e3.context_turns, e3.context_tokens, e3.context_text) == (0, 0, "")
    # spans-only mode drops the quadratic text column
    lean = explode_sft_examples(turns, with_text=False)
    assert "context_text" not in lean.columns


def test_best_of_n_keeps_top_scored_sibling(spark):
    from omniparser_spark.operators.transcripts import best_of_n

    rows = [
        # sibling group under parent 1: scores 10, 30, 30 (tie)
        ("A", 2, 1, "assistant", "cand-low"),
        ("A", 3, 1, "assistant", "cand-tie-early"),
        ("A", 4, 1, "assistant", "cand-tie-late"),
        # lone candidate under parent 5: best of 1 is itself
        ("A", 6, 5, "assistant", "lone"),
        # root-level candidate (NULL parent) forms its own group
        ("B", 1, None, "assistant", "root"),
        # non-candidate role is dropped before grouping
        ("A", 7, 1, "user", "not-a-candidate"),
    ]
    turns = spark.createDataFrame(rows, TREE_SCHEMA)
    score = (
        F.when(F.col("turn_id") == 2, 10)
        .when(F.col("turn_id").isin(3, 4), 30)
        .otherwise(1)
    )
    out = {
        r.turn_id: (r.n_candidates, r.score)
        for r in best_of_n(
            turns, score, candidate_filter=F.col("role") == "assistant"
        ).collect()
    }
    # tie broken to the LOWEST id; group sizes reported; user row gone
    assert out == {3: (3, 30), 6: (1, 1), 1: (1, 1)}


def test_conversation_lint_flags_each_defect_independently(spark):
    from omniparser_spark.operators.transcripts import conversation_lint

    rows = [
        # clean conversation
        ("ok", 0, "user", "hi"),
        ("ok", 1, "assistant", "hello"),
        # double assistant turn -> alternation fails, rest ok
        ("alt", 0, "user", "a"),
        ("alt", 1, "assistant", "b"),
        ("alt", 2, "assistant", "c"),
        # opens with assistant -> starts fails
        ("open", 0, "assistant", "x"),
        ("open", 1, "user", "y"),
        # blank turn -> nonempty fails
        ("blank", 0, "user", "  "),
        ("blank", 1, "assistant", "z"),
        # gap in ordering -> contiguous fails
        ("gap", 0, "user", "p"),
        ("gap", 2, "assistant", "q"),
        # duplicate order -> contiguous fails (verdict still
        # deterministic: adjacency ordered by role/text tie-breakers)
        ("dup", 0, "user", "r"),
        ("dup", 1, "assistant", "s"),
        ("dup", 1, "user", "t"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string"
    )
    out = {
        r.conv_id: (
            r.alternation_ok, r.starts_ok, r.nonempty_ok,
            r.contiguous_ok, r.ok,
        )
        for r in conversation_lint(turns).collect()
    }
    assert out["ok"] == (True, True, True, True, True)
    assert out["alt"] == (False, True, True, True, False)
    assert out["open"] == (True, False, True, True, False)
    assert out["blank"] == (True, True, False, True, False)
    assert out["gap"] == (True, True, True, False, False)
    assert out["dup"][3] is False and out["dup"][4] is False


def test_tree_stats_counts_branches_and_leaves(spark):
    from omniparser_spark.operators.transcripts import tree_stats

    rows = [
        # conv A: 1 -> 2 -> {3, 4}, 4 -> 5   (one branch point, 2 leaves)
        ("A", 1, None, "user", "q"),
        ("A", 2, 1, "assistant", "a"),
        ("A", 3, 2, "user", "r1"),
        ("A", 4, 2, "user", "r2"),
        ("A", 5, 4, "assistant", "b"),
        # conv B: single turn
        ("B", 1, None, "user", "solo"),
        # conv C: triple regeneration under one parent
        ("C", 1, None, "user", "q"),
        ("C", 2, 1, "assistant", "g1"),
        ("C", 3, 1, "assistant", "g2"),
        ("C", 4, 1, "assistant", "g3"),
    ]
    turns = spark.createDataFrame(rows, TREE_SCHEMA)
    out = {r.conv_id: r for r in tree_stats(turns).collect()}
    a = out["A"]
    assert (a.n_turns, a.n_roots, a.n_leaves) == (5, 1, 2)
    assert (a.n_branch_points, a.n_regens, a.max_siblings) == (1, 1, 2)
    b = out["B"]
    assert (b.n_turns, b.n_roots, b.n_leaves) == (1, 1, 1)
    assert (b.n_branch_points, b.n_regens, b.max_siblings) == (0, 0, 0)
    c = out["C"]
    assert (c.n_leaves, c.n_branch_points, c.n_regens, c.max_siblings) == (
        3, 1, 2, 3,
    )


def test_trajectory_stats_semantics(spark):
    """Streak islands, failure predicate, tool-free conversations,
    and integer pacing stats."""
    import datetime as dt

    from omniparser_spark.operators.transcripts import trajectory_stats

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # c1: tools at turns 1,2,3 (streak 3) and 5 (streak 1); turn 2 fails
        ("c1", 0, None, ts(0), False),
        ("c1", 1, "search", ts(10), False),
        ("c1", 2, "search", ts(20), True),
        ("c1", 3, "python", ts(30), False),
        ("c1", 4, None, ts(40), False),
        ("c1", 5, "browser", ts(100), False),
        # c2: no tools at all
        ("c2", 0, None, ts(0), False),
        ("c2", 1, None, ts(7), False),
        # c3: single turn
        ("c3", 0, "search", ts(0), False),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, "
              "ts timestamp, fail boolean",
    )
    out = {
        r["conv_id"]: r
        for r in trajectory_stats(df, failed=F.col("fail")).collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 6 and c1["n_tool_calls"] == 4
    assert c1["n_distinct_tools"] == 3
    assert c1["max_tool_streak"] == 3
    assert c1["first_tool_turn"] == 1
    assert c1["n_tool_failures"] == 1
    assert c1["duration_us"] == 100_000_000
    assert c1["mean_gap_us"] == 20_000_000
    c2 = out["c2"]
    assert c2["n_tool_calls"] == 0 and c2["max_tool_streak"] == 0
    assert c2["first_tool_turn"] is None
    c3 = out["c3"]
    assert c3["duration_us"] == 0 and c3["mean_gap_us"] == 0
    assert c3["max_tool_streak"] == 1


def test_tool_transitions_semantics(spark):
    from omniparser_spark.operators.transcripts import tool_transitions

    rows = [
        ("c1", 0, "search"), ("c1", 1, None), ("c1", 2, "search"),
        ("c1", 3, "python"),
        ("c2", 0, "search"), ("c2", 1, "python"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    got = {
        (r["from_tool"], r["to_tool"]): r["n"]
        for r in tool_transitions(df).collect()
    }
    # gaps (non-tool turns) do NOT reset the chain: search->search
    assert got == {
        ("<start>", "search"): 2,
        ("search", "search"): 1,
        ("search", "python"): 2,
    }


def test_segment_sessions_gaps(spark):
    import datetime as dt

    from omniparser_spark.operators.transcripts import (
        segment_sessions,
        session_stats,
    )

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        ("c1", 0, ts(0)), ("c1", 1, ts(5)),          # session 0
        ("c1", 2, ts(90)), ("c1", 3, ts(95)),        # gap 85m -> s1
        ("c1", 4, ts(200)),                          # gap 105m -> s2
        ("c2", 0, ts(0)),                            # single turn
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp"
    )
    s = segment_sessions(df, gap_seconds=1800)
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_idx"]
        for r in s.collect()
    }
    assert got == {
        ("c1", 0): 0, ("c1", 1): 0, ("c1", 2): 1, ("c1", 3): 1,
        ("c1", 4): 2, ("c2", 0): 0,
    }
    st = {
        (r["conv_id"], r["session_idx"]): (r["n_turns"], r["span_us"])
        for r in session_stats(s).collect()
    }
    assert st[("c1", 0)] == (2, 5 * 60 * 1_000_000)
    assert st[("c1", 2)] == (1, 0)
    assert st[("c2", 0)] == (1, 0)
