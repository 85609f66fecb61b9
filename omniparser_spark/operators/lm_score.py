"""CCNet-style n-gram LM perplexity scoring for corpus quality.

The CCNet / RefinedWeb recipe: train a small language model on a CLEAN
reference corpus, score every candidate document by its perplexity
under that model, and keep the low-perplexity head (fluent, reference-
like text) while dropping the tail (gibberish, boilerplate, wrong
language). This module implements the unigram variant as pure
DataFrame ops:

- :func:`train_unigram_lm` — exact token counts over the reference
  slice, emitted as a per-token SURPRISAL table in milli-nats
  (``floor(ln(N / count) * 1000)`` as BIGINT). Fixed-point integers
  make every downstream aggregate exact: summation order cannot change
  the result, so scores are bit-reproducible across partitionings and
  engines (the same discipline as the k-means integer grid,
  ``clustering.py``).
- :func:`perplexity_score` — tokenize candidates with the SAME
  normalization, broadcast-join the surprisal table, give
  out-of-vocabulary tokens the add-half surprisal ``ln(2N)`` (an
  unseen token is charged as probability 0.5/N), and emit per-doc
  mean surprisal (= ln(perplexity)) in milli-nats plus OOV counts.
- :func:`perplexity_buckets` — CCNet's head/middle/tail split via
  VALUE-level quantile boundaries from a bounded histogram (ties
  share a bucket; deliberately NOT an ntile window — see its
  docstring for the scale argument).
- :func:`train_bigram_lm` / :func:`bigram_perplexity_score` — the
  n-gram upgrade: bigram costs with stupid backoff, context-aware
  fluency instead of bag-of-words frequency.

Scale shape: training is one explode + one token-count aggregate
(map-side combinable) + a 1-row total broadcast; scoring is a scan +
BROADCAST join (the vocab is bounded — a few million tokens — while
the corpus is 100 TB) + one per-doc aggregate. Nothing shuffles the
corpus twice, nothing is quadratic, no UDFs.

Tokenization matches ``functions/text.py`` / the dedup family:
``lower → collapse whitespace → split on ' '`` — the exact
normalization the DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omniparser_spark.operators.dedup_text import normalized_text


def _words(text_col: str):
    return F.split(normalized_text(F.col(text_col)), " ")


def train_unigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact unigram counts over the reference corpus -> surprisal
    table ``(token, cnt, surprisal_mnats)``. ``surprisal_mnats =
    floor(ln(N / cnt) * 1000)`` where N is the reference token total;
    the single float op happens HERE, once per vocab entry — every
    later aggregate is integer-exact.

    Empty reference documents contribute nothing; the result is small
    (vocab-sized) and meant to be broadcast by the scorer.
    """
    toks = (
        ref.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(_words(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = toks.agg(F.sum("cnt").alias("_n"))
    return toks.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.floor(
            F.log(F.col("_n").cast("double") / F.col("cnt")) * 1000
        ).cast("long").alias("surprisal_mnats"),
        F.col("_n").alias("ref_total"),
    )


def perplexity_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every candidate document under the trained LM.

    Returns ``(id_col, n_tokens, oov_tokens, ppl_mnats)`` where
    ``ppl_mnats`` is the integer mean per-token surprisal in
    milli-nats (= 1000 * ln(perplexity)); OOV tokens are charged the
    add-half surprisal ``floor(ln(2N) * 1000)``. Lower = more
    reference-like. Empty documents are excluded (nothing to score).

    The LM side is broadcast: the corpus-side explode never shuffles —
    one scan, one per-doc aggregate.
    """
    oov = lm.select(
        F.floor(
            F.log(F.col("ref_total").cast("double") * 2) * 1000
        ).cast("long").alias("_oov_mnats")
    ).limit(1)
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.explode(_words(text_col)).alias("token"),
        )
    )
    joined = toks.join(
        F.broadcast(lm.select("token", "surprisal_mnats")),
        "token",
        "left",
    ).crossJoin(F.broadcast(oov))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(
                F.when(F.col("surprisal_mnats").isNull(), 1)
            ).alias("oov_tokens"),
            F.sum(
                F.coalesce(F.col("surprisal_mnats"), F.col("_oov_mnats"))
            ).alias("_sum_mnats"),
        )
        .select(
            id_col,
            "n_tokens",
            "oov_tokens",
            F.expr("_sum_mnats DIV n_tokens").alias("ppl_mnats"),
        )
    )


def perplexity_buckets(
    scored: DataFrame, id_col: str = "doc_id", n_buckets: int = 3
) -> DataFrame:
    """CCNet head/middle/tail split by VALUE-level quantile boundaries
    — bucket 1 is the low-perplexity head a quality-filtered
    pretraining mix keeps.

    NOT an ntile window: a global ordered window is a single-task sort
    at corpus scale. Instead the same two-pass histogram-threshold
    shape as ``selection.py``: ``ppl_mnats`` is a bounded-cardinality
    integer domain (milli-nats of mean surprisal — ~10^4 distinct
    values whatever the corpus size), so one count-per-value aggregate
    comes to the driver, a cumulative scan picks boundary values
    ``b_i = min{v : cum(v) >= ceil(i * total / k)}``, and the bucket
    is a narrow-map CASE over the boundaries. Ties share a bucket
    (value-level terciles, not row-level — deterministic under any
    partitioning, no total-order sort anywhere)."""
    hist = sorted(
        (int(r["ppl_mnats"]), int(r["c"]))
        for r in scored.groupBy("ppl_mnats")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    total = sum(c for _v, c in hist)
    boundaries: list[int] = []
    cum = 0
    targets = [
        -(-i * total // n_buckets) for i in range(1, n_buckets)
    ]  # ceil(i*total/k)
    it = iter(targets)
    tgt = next(it, None)
    for v, c in hist:
        cum += c
        while tgt is not None and cum >= tgt:
            boundaries.append(v)
            tgt = next(it, None)
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + F.when(F.col("ppl_mnats") > b, 1).otherwise(0)
    return scored.select(
        id_col, "ppl_mnats", bucket.cast("int").alias("ppl_bucket")
    )


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Bigram LM with exact counts over the reference corpus.

    Returns (unigrams, bigrams): ``unigrams`` is the
    :func:`train_unigram_lm` table (token, cnt, surprisal_mnats,
    ref_total); ``bigrams`` carries (prev, token, cnt2, cnt_prev) —
    each bigram row pre-joined with its history count so scoring
    needs ONE bigram join, not two. Pair extraction is a higher-order
    array transform (shuffle-free); the counts are one aggregate
    each."""
    uni = train_unigram_lm(ref, text_col)
    ws = _words(text_col)
    # guard: sequence(2, 1) DESCENDS for single-token docs — emit no
    # pairs instead
    pair_idx = F.when(
        F.size(ws) >= 2, F.sequence(F.lit(2), F.size(ws))
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
        ref.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at(ws, i - 1).alias("prev"),
                        F.element_at(ws, i).alias("token"),
                    ),
                )
            ).alias("_p")
        )
        .select("_p.prev", "_p.token")
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("cnt2"))
    )
    hist = uni.select(
        F.col("token").alias("prev"), F.col("cnt").alias("cnt_prev")
    )
    bigrams = pairs.join(hist, "prev")
    return uni, bigrams


def bigram_perplexity_score(
    docs: DataFrame,
    uni: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score candidates under the bigram LM with STUPID BACKOFF
    (Brants et al.): token i is charged

    - ``ln(cnt_prev / cnt2)`` milli-nats when its bigram was seen;
    - else the backed-off unigram cost ``ln(N / (0.4 * cnt))``
      (``ln(2N / 0.4)`` for OOV) — each branch ONE ln expression
      quantized once, so aggregation stays integer-exact;
    - the document's first token is charged its plain unigram cost.

    Returns (id, n_tokens, bigram_hits, ppl_mnats). Joins: one on the
    bigram key, one on the token — both broadcastable while the vocab
    fits (the common case), shuffle hash joins beyond that; the
    corpus itself is scanned once."""
    ws = _words(text_col)
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws)),
                    lambda i: F.struct(
                        F.when(i > 1, F.element_at(ws, i - 1)).alias(
                            "prev"
                        ),
                        F.element_at(ws, i).alias("token"),
                        (i == 1).alias("first"),
                    ),
                )
            ).alias("_p")
        )
        .select(id_col, "_p.prev", "_p.token", "_p.first")
    )
    n_lit = F.col("ref_total").cast("double")
    # uni is vocab-sized: a safe broadcast. The BIGRAM table scales
    # with the reference corpus (can be 100x the vocab), so no forced
    # hint — the planner broadcasts under the threshold and falls back
    # to a shuffle hash join beyond it (review finding: a hard
    # F.broadcast here OOMs the driver at reference scale).
    uni_side = F.broadcast(
        uni.select("token", "cnt", "ref_total")
    )
    j = toks.join(uni_side, "token", "left").join(
        bigrams, ["prev", "token"], "left"
    )
    first_cost = F.when(
        F.col("cnt").isNotNull(),
        F.floor(F.log(n_lit / F.col("cnt")) * 1000),
    ).otherwise(F.floor(F.log(F.lit(2.0) * n_lit) * 1000))
    hit_cost = F.floor(
        F.log(F.col("cnt_prev").cast("double") / F.col("cnt2")) * 1000
    )
    backoff_cost = F.when(
        F.col("cnt").isNotNull(),
        F.floor(
            F.log(n_lit / (F.lit(0.4) * F.col("cnt"))) * 1000
        ),
    ).otherwise(
        F.floor(F.log(F.lit(2.0) * n_lit / F.lit(0.4)) * 1000)
    )
    # OOV rows missed the unigram join, so ref_total is NULL there —
    # recover it from any joined row via a 1-row broadcast constant
    n_const = uni.select(
        F.first("ref_total").alias("_n")
    ).limit(1)
    j = j.crossJoin(F.broadcast(n_const)).withColumn(
        "ref_total", F.coalesce(F.col("ref_total"), F.col("_n"))
    )
    cost = F.when(F.col("first"), first_cost).when(
        F.col("cnt2").isNotNull(), hit_cost
    ).otherwise(backoff_cost)
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(
                F.when(~F.col("first") & F.col("cnt2").isNotNull(), 1)
            ).alias("bigram_hits"),
            F.sum(cost.cast("long")).alias("_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "bigram_hits",
            F.expr("_sum DIV n_tokens").alias("ppl_mnats"),
        )
    )
