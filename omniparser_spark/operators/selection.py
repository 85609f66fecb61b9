"""Token-budget corpus selection: keep the highest-quality documents
until a global token budget is exhausted.

The training-data curation primitive "take the best N-billion tokens":
rank docs by (quality DESC, id ASC) and keep the largest prefix whose
inclusive running token total stays <= budget.

The naive plan is a GLOBAL sort + cumulative sum — one total order at
100 TB, exactly what we refuse to ship.  Scale shape here is the
classic two-pass histogram threshold:

1. bin docs by quality (``bin = floor(q * n_bins)``, q in [0,1]); one
   map-side-combinable aggregate gives per-bin token totals — n_bins
   rows to the driver, nothing else.
2. the driver prefix-sums bins in quality-descending order.  Bins whose
   START offset already exceeds the budget are discarded without
   another look; every surviving (candidate) bin gets its driver-known
   global offset broadcast back, and a window partitioned BY BIN
   (parallel across bins, ~rows/n_bins each — `n_bins` is the skew
   knob) computes exact per-doc global running totals; the final filter
   is ``cum_tokens <= budget``.

Arithmetic is integer end-to-end (token counts, BIGINT sums), so the
distributed result is bit-identical to the single-pass oracle — no
float accumulation-order divergence.

Caveat (documented, inherent): a single quality value carrying a huge
share of mass (e.g. millions of docs with identical q at the budget
boundary) bounds below what binning can split; that mass lands in one
bin's window partition.  Raising ``n_bins`` splits everything except
exact ties, which no quality ranking can order anyway (id tie-break
decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "q",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_bins: int = 1000,
) -> DataFrame:
    """Greedy prefix selection under a token budget.

    Returns the input rows (plus ``cum_tokens``) for which the running
    inclusive token total — over (quality DESC, id ASC) order — is
    <= ``budget``.  ``quality_col`` must be in [0, 1]; ``token_col``
    must be a non-negative integer column.
    """
    q = F.col(quality_col)
    binc = F.least(
        F.floor(q * n_bins).cast("int"), F.lit(n_bins - 1)
    )  # q == 1.0 lands in the top bin, not one past it
    # a NULL quality cannot be ranked: excluded, not crashed on (a null
    # bin would otherwise break the driver-side bin sort)
    d = df.filter(q.isNotNull()).withColumn("_bin", binc)

    # pass 1: n_bins rows to the driver (the ONLY collect)
    stats = {
        r["_bin"]: r["t"]
        for r in d.groupBy("_bin")
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    run = 0
    for b in sorted(stats, reverse=True):  # quality-descending
        offsets[b] = run
        run += int(stats[b])

    candidates = [b for b in offsets if offsets[b] <= budget]
    if not candidates:
        return (
            d.filter(F.lit(False))
            .withColumn("cum_tokens", F.lit(0).cast("long"))
            .drop("_bin")
        )
    off_df = d.sparkSession.createDataFrame(
        [(b, offsets[b]) for b in candidates], "_bin int, _off long"
    )

    w = Window.partitionBy("_bin").orderBy(
        q.desc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.join(F.broadcast(off_df), "_bin")  # drops non-candidate bins
        .withColumn(
            "cum_tokens",
            F.col("_off") + F.sum(F.col(token_col).cast("long")).over(w),
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("_bin", "_off")
    )
