"""Token-budget selection: bit-equality with the naive global-sort
plan, prefix semantics, and edge budgets."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omniparser_spark.operators.selection import select_token_budget


def _docs(spark, n, parts=8):
    # deterministic q in [0,1] with deliberate ties; tokens 1..40
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        (F.round((F.col("id") * 37 % 101) / 101.0, 3)).alias("q"),
        ((F.col("id") * 13 % 40) + 1).cast("int").alias("n_tokens"),
    )


def _naive(df, budget):
    w = (
        Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "cum_tokens", F.sum(F.col("n_tokens").cast("long")).over(w)
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def test_matches_global_sort_exactly(spark):
    d = _docs(spark, 2000)
    for budget in (0, 1, 997, 10_000, 10**9):
        got = {
            (r.doc_id, r.cum_tokens)
            for r in select_token_budget(d, budget, n_bins=50).collect()
        }
        want = {
            (r.doc_id, r.cum_tokens) for r in _naive(d, budget).collect()
        }
        assert got == want, f"budget={budget}"


def test_selection_is_a_quality_prefix(spark):
    d = _docs(spark, 1000)
    kept = select_token_budget(d, 5000, n_bins=100)
    min_kept_q = kept.agg(F.min("q")).collect()[0][0]
    boundary = kept.filter(F.col("q") == min_kept_q).count()
    # every doc strictly above the worst kept quality was selected
    n_above = d.filter(F.col("q") > min_kept_q).count()
    assert kept.count() == n_above + boundary
    total = kept.agg(F.sum("n_tokens")).collect()[0][0]
    assert total <= 5000


def test_bin_count_does_not_change_result(spark):
    d = _docs(spark, 1500)
    a = {r.doc_id for r in select_token_budget(d, 3000, n_bins=10).collect()}
    b = {r.doc_id for r in select_token_budget(d, 3000, n_bins=1000).collect()}
    assert a == b
