"""As-of join semantics: backward match, exact-timestamp inclusion,
no-prior-row NULL, tiebreak determinism."""

from __future__ import annotations

import datetime

from omniparser_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 6, 1, 12, m, 0)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(0), "e0"),   # before any right row -> NULL
            ("u1", _ts(5), "e5"),   # exactly at right ts 5 -> v5
            ("u1", _ts(7), "e7"),   # between 5 and 10 -> v5
            ("u1", _ts(12), "e12"),  # after 10 -> v10
            ("u2", _ts(9), "x9"),   # other key -> its own stream
        ],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), "v5"),
            ("u1", _ts(10), "v10"),
            ("u2", _ts(1), "w1"),
        ],
        "k string, ts timestamp, val string",
    )
    out = {
        r.ev: r.val
        for r in asof_join(left, right, key="k").collect()
    }
    assert out == {"e0": None, "e5": "v5", "e7": "v5", "e12": "v10", "x9": "w1"}


def test_asof_tiebreak_picks_latest(spark):
    left = spark.createDataFrame(
        [("u", _ts(6), "e")], "k string, ts timestamp, ev string"
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 1, "first"), ("u", _ts(5), 2, "second")],
        "k string, ts timestamp, seq int, val string",
    )
    rows = asof_join(
        left, right, key="k", value_cols=["val"], tiebreak="seq"
    ).collect()
    assert rows[0].val == "second"


def test_asof_multiple_value_cols_and_keys(spark):
    left = spark.createDataFrame(
        [("a", 1, _ts(8), "L")], "k1 string, k2 int, ts timestamp, ev string"
    )
    right = spark.createDataFrame(
        [("a", 1, _ts(3), "x", 7), ("a", 2, _ts(4), "y", 9)],
        "k1 string, k2 int, ts timestamp, s string, n int",
    )
    (r,) = asof_join(left, right, key=["k1", "k2"]).collect()
    assert (r.s, r.n) == ("x", 7)  # k2=2 row excluded by the compound key


def test_asof_tiebreak_nonnumeric_types(spark):
    """ADVICE item: a string or timestamp tiebreak must order in its
    OWN type — the old left-side int-0 literal either failed unionByName
    analysis or coerced both sides to string. Also guard the numeric
    case against lexicographic coercion (10 > 9 numerically, but
    '10' < '9' as strings)."""
    left = spark.createDataFrame(
        [("u", _ts(6), "e")], "k string, ts timestamp, ev string"
    )
    # string tiebreak: native (lexicographic) order, 'b' wins
    right_s = spark.createDataFrame(
        [("u", _ts(5), "a", "first"), ("u", _ts(5), "b", "second")],
        "k string, ts timestamp, seq string, val string",
    )
    (r,) = asof_join(left, right_s, key="k", value_cols=["val"],
                     tiebreak="seq").collect()
    assert r.val == "second"
    # timestamp tiebreak: later ingest time wins
    right_t = spark.createDataFrame(
        [("u", _ts(5), _ts(1), "old"), ("u", _ts(5), _ts(2), "new")],
        "k string, ts timestamp, ingest timestamp, val string",
    )
    (r,) = asof_join(left, right_t, key="k", value_cols=["val"],
                     tiebreak="ingest").collect()
    assert r.val == "new"
    # long tiebreak where lexicographic would invert the winner
    right_n = spark.createDataFrame(
        [("u", _ts(5), 9, "nine"), ("u", _ts(5), 10, "ten")],
        "k string, ts timestamp, seq long, val string",
    )
    (r,) = asof_join(left, right_n, key="k", value_cols=["val"],
                     tiebreak="seq").collect()
    assert r.val == "ten"
