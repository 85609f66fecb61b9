"""Assembly, multimodal plumbing, streaming front-end, dedup-family
sanity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from omniparser_spark.operators.assembly import (
    assemble_delimited_payload,
    assemble_parent_child,
)
from omniparser_spark.operators.dedup_text import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from omniparser_spark.operators.multimodal import (
    extract_features,
    synthetic_media,
)
from omniparser_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_topk,
)


def test_assemble_parent_child(spark):
    rows = [
        ("f1", 1, "H", "order-1"),
        ("f1", 2, "D", "item-a"),
        ("f1", 3, "D", "item-b"),
        ("f1", 4, "H", "order-2"),
        ("f1", 5, "D", "item-c"),
        ("f2", 1, "D", "orphan"),   # child before any parent
        ("f2", 2, "H", "order-3"),
    ]
    df = spark.createDataFrame(rows, "file_id string, line_no int, tag string, body string")
    records, quarantine = assemble_parent_child(
        df, is_parent=F.col("tag") == "H", min_children=1
    )
    recs = {
        (r["file_id"], r["record_seq"]): r for r in records.collect()
    }
    assert recs[("f1", 1)]["parent"]["body"] == "order-1"
    assert [c["body"] for c in recs[("f1", 1)]["children"]] == ["item-a", "item-b"]
    assert [c["body"] for c in recs[("f1", 2)]["children"]] == ["item-c"]
    q = quarantine.collect()
    errs = {(r["file_id"], r["record_seq"]): r["error"] for r in q}
    assert ("f2", 0) in errs  # orphan child
    assert ("f2", 1) in errs  # order-3 has 0 children < min_occurs 1


def test_assemble_delimited_payload(spark):
    payload = "H,conv_9,2024-06-01\nD,0,user,hi\nD,1,assistant,yo"
    df = spark.createDataFrame([(payload,)], "payload string")
    out = assemble_delimited_payload(df).collect()[0]
    assert out["header"] == ["H", "conv_9", "2024-06-01"]
    assert out["details"] == [["D", "0", "user", "hi"], ["D", "1", "assistant", "yo"]]


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["n_bytes"] == 128  # 8 x md5 = 128 bytes
        assert len(r["sha256"]) == 64
        assert len(r["features"]) == 16
    # determinism
    again = {r["media_id"]: r["sha256"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["sha256"] for r in rows)


def test_streaming_apply(spark, tmp_path):
    """File-stream front-end converges to the same state as batch."""
    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed
    from omniparser_spark.streaming import run_streaming_apply

    spec = FeedSpec(n_events=600, n_convs=20, seed=3)
    feed_path = str(tmp_path / "feed")
    feed = materialize_feed(spark, spec, feed_path, num_partitions=6)

    # batch reference run
    pb = CdcPipeline(spark, str(tmp_path / "bt"), str(tmp_path / "bc"), n_buckets=4)
    pb.run(
        lambda s, e: feed.filter((F.col("offset") >= s) & (F.col("offset") <= e)),
        spec.n_events,
        batch_size=200,
    )
    want = sorted(
        tuple(r)
        for r in pb.read_table()
        .select("conv_id", "turn_idx", "text")
        .collect()
    )

    ps = CdcPipeline(spark, str(tmp_path / "st"), str(tmp_path / "sc"), n_buckets=4)
    recs = run_streaming_apply(ps, feed_path, max_files_per_trigger=2)
    assert recs, "stream should have applied at least one epoch"
    got = sorted(
        tuple(r)
        for r in ps.read_table()
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    assert got == want


def test_dedup_exact_keeps_one(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = dedup_exact(df)
    assert out.count() == 2
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 3}  # min doc_id representative


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely unrelated text about spark window aggregation plans"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(df, num_hashes=16, bands=8, k=2)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # identical
    assert (1, 2) in got and got[(1, 2)] > 0.5   # near dup
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog in the yard today"
    near = base.replace("today", "tonight")
    far = "rows columns shuffles partitions exchange hash aggregate codegen"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sh = df.select(simhash(F.col("text")).alias("s")).collect()
    assert all(0 <= r["s"] < (1 << 32) for r in sh)
    pairs = simhash_near_dups(df, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "v w x y z")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, k=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got == {(1, 2): 1.0}


def test_lsh_topk_recall_vs_bruteforce(spark):
    from omniparser_spark.sources.changefeed import FeedSpec  # noqa: F401 (seed const)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    # the synthetic embeddings are weakly clustered (top-neighbor cos
    # ~0.3-0.4, i.e. ~68 deg): per-table collision at b bits is
    # (1 - theta/pi)^b, so recall needs few bits / many tables here;
    # strongly-clustered production corpora support more bits (bigger
    # candidate pruning). This is the standard LSH recall/cost dial.
    approx = lsh_topk(emb, queries, dim=64, k=5, n_bits=4, n_tables=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall too low: {recall}"
