"""Custom-func parity tests (uuidv3 vs Python uuid3, datetime suite,
coalesce blank-vs-empty semantics, text analysis determinism)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from omniparser_spark.functions import builtin as B
from omniparser_spark.functions import datetime as D
from omniparser_spark.functions import text as X
from omniparser_spark.functions.registry import default_registry


def test_uuidv3_matches_python_uuid(spark):
    """Byte-compatible with uuid.NewMD5(uuid.Nil, s) — the reference's
    uuidv3 (customfuncs/customFuncs.go:76-79)."""
    samples = ["", "hello", "héllo wörld 試験", "conv_000042|3"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["u"] for r in df.select("s", B.uuidv3(F.col("s")).alias("u")).collect()}
    for s in samples:
        want = str(uuid.uuid3(uuid.UUID(int=0), s))
        assert got[s] == want, f"uuidv3({s!r}): {got[s]} != {want}"


def test_coalesce_blank_is_not_empty(spark):
    """Reference semantics: '' skips, '  ' (blank) does NOT skip
    (customfuncs/customFuncs.go:45-55)."""
    df = spark.range(1)
    row = df.select(
        B.coalesce_nonempty(F.lit(""), F.lit("  "), F.lit("x")).alias("a"),
        B.coalesce_nonempty(F.lit(""), F.lit(None), F.lit("y")).alias("b"),
        B.coalesce_nonempty(F.lit(""), F.lit("")).alias("c"),
    ).collect()[0]
    assert row["a"] == "  "
    assert row["b"] == "y"
    assert row["c"] == ""


def test_datetime_smart_parse(spark):
    cases = [
        ("2024-06-01T12:34:56Z", "2024-06-01T12:34:56Z"),
        ("2024-06-01 12:34:56", "2024-06-01T12:34:56Z"),
        ("2024/06/01 12:34:56", "2024-06-01T12:34:56Z"),
        ("06/01/2024 12:34:56", "2024-06-01T12:34:56Z"),
        ("2024-06-01", "2024-06-01T00:00:00Z"),
        ("garbage", None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "s string")
    got = {
        r["s"]: r["o"]
        for r in df.select(
            "s", D.datetime_to_rfc3339(F.col("s")).alias("o")
        ).collect()
    }
    for s, want in cases:
        assert got[s] == want, f"{s}: {got[s]} != {want}"


def test_datetime_epoch_roundtrip(spark):
    df = spark.createDataFrame([("2024-06-01T00:00:05Z",)], "s string")
    row = df.select(
        D.datetime_to_epoch(F.col("s"), "seconds").alias("es"),
        D.datetime_to_epoch(F.col("s"), "milliseconds").alias("ems"),
        D.epoch_to_rfc3339(F.lit(1717200005), "seconds").alias("rt"),
    ).collect()[0]
    assert row["es"] == 1717200005
    assert row["ems"] == 1717200005000
    assert row["rt"] == "2024-06-01T00:00:05Z"


def test_registry_merge_and_ignore_error(spark):
    r = default_registry()
    assert "uuidv3" in r.names()
    df = spark.createDataFrame([("x",), (None,)], "s string")
    out = df.select(
        r.build("upper", F.col("s"), ignore_error=True).alias("u")
    ).collect()
    assert {row["u"] for row in out} == {"X", None}


def test_language_detection(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in that house for it was warm",),
            ("der hund und die katze ist nicht auf das haus",),
            ("le chat est dans la maison pour les amis",),
            ("el perro y el gato en la casa con un amigo",),
            ("zzz qqq xxx",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(X.detect_language(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [("a solid sentence with several reasonable words here",), ("",), ("!!! ??? ###",)],
        "t string",
    )
    rows = df.select(
        X.token_count(F.col("t")).alias("n"),
        X.quality_score(F.col("t")).alias("q"),
        X.bpe_ish_token_count(F.col("t")).alias("b"),
    ).collect()
    assert rows[0]["n"] == 8
    assert rows[0]["q"] > 0.3
    assert rows[1]["n"] == 0
    assert rows[2]["q"] == 0.0  # pure punctuation
    assert rows[0]["b"] >= 8


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",)], "t string")
    fps = [r["f"] for r in df.select(X.fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_repetition_profile_signals(spark):
    from omniparser_spark.functions.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # maximal repetition
            (2, "all words here are unique ok"),   # none
            (3, "one"),                            # single word
            (4, ""),                               # excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].dup_word_frac == 0.75      # 1 distinct of 4
    assert out[1].top_word_frac == 1.0
    assert out[1].top_bigram_frac == 1.0     # "spam spam" x3 of 3
    assert out[2].dup_word_frac == 0.0
    assert out[2].top_word_frac == round(1 / 6, 6)
    assert out[3].n_words == 1
    assert out[3].top_bigram_frac == 0.0


def test_fix_text_artifacts(spark):
    """Mojibake repair, invisible-char stripping, NBSP normalization,
    and the no-touch guarantee for well-formed text."""
    from omniparser_spark.functions.text import fix_text_artifacts

    rows = [
        (1, "cafÃ© â€œgreatâ€™"),
        (2, "a​b‌c﻿d"),
        (3, "x y"),
        (4, "ctl\x01\x02ok\ttab\nnl\rcr"),
        (5, "already clean — café “fine”"),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", fix_text_artifacts("t").alias("f")
        ).collect()
    }
    assert got[1] == "café “great’"
    assert got[2] == "abcd"
    assert got[3] == "x y"
    assert got[4] == "ctlok\ttab\nnlcr"  # tab/newline survive, \r stripped
    assert got[5] == rows[4][1]          # well-formed text untouched
