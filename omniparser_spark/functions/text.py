"""Text-analysis functions for large-scale training-data pipelines.

These go beyond the reference's operator set (required additions for
the 100 TB training-data use case): language ID, quality scoring,
token counting, and document fingerprinting — each a pure column
expression (codegen'd, shuffle-free, scan-bound at scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword inventories for the n-gram/stopword
# heuristic language ID (public common-words lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
}


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def token_count(col) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    )


def bpe_ish_token_count(col) -> Column:
    """BPE-ish subword proxy: count regex word pieces + digits + punct
    runs — a deterministic, vocabulary-free stand-in for tokenizer
    counts, good enough for length filtering at scale."""
    c = _c(col)
    pieces = F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def _word_set(col) -> Column:
    return F.array_distinct(
        F.split(F.lower(F.trim(_c(col))), r"[^\p{L}\p{Nd}]+")
    )


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of distinct words that are stopwords of `lang`."""
    words = _word_set(col)
    words = F.filter(words, lambda w: F.length(w) > 0)
    hits = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def detect_language(col) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit
    counts; 'und' (undetermined) when nothing matches."""
    words = _word_set(col)
    scores = [
        (
            lang,
            F.size(
                F.array_intersect(
                    words, F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                )
            ),
        )
        for lang in sorted(STOPWORDS)
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier (alphabetical) languages win ties
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col) -> Column:
    """Deterministic document-quality heuristic in [0, 1]:
    length score x alpha ratio x (1 - punct excess). Mirrors common
    pretraining-corpus filters (length / symbol-ratio / word stats)."""
    c = _c(col)
    n = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, r"[^\p{L}]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(c, r"[\p{L}\p{Nd}\s]", "")).cast("double")
    n_tokens = token_count(c).cast("double")
    len_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(n_punct / n * 4.0, F.lit(1.0))).otherwise(
        F.lit(1.0)
    )
    return F.round(len_score * alpha_ratio * (1.0 - punct_penalty), 6)


def fingerprint(col, modulus: int = 1_000_000_007, base: int = 257) -> Column:
    """Rolling polynomial hash over the document's words (order-aware
    document fingerprint). fp = sum(word_hash_i * base^(n-1-i)) mod m,
    computed with F.aggregate — distributed, no UDF.

    word_hash = first 8 hex chars of md5(word), an engine-independent
    31-bit value (reproducible in any SQL engine for oracle checks).
    """
    words = F.split(F.lower(F.trim(_c(col))), r"\s+")
    hashes = F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
        % F.lit(modulus),
    )
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * base + h) % F.lit(modulus),
    )


def repetition_profile(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """Gopher-style repetition signals per document (the standard
    quality gates for web-scale training text — highly repetitive docs
    are boilerplate/spam):

    - `dup_word_frac`: 1 - distinct_words / words (pure column expr);
    - `top_word_frac`: occurrences of the most frequent word / words;
    - `top_bigram_frac`: occurrences of the most frequent word bigram
      / bigrams (single-word docs: 0).

    Scale shape: one explode + one (doc, gram) partial-count + one
    per-doc max — two map-side-combinable aggregations keyed by doc,
    no windows, no cross-doc traffic; cost is O(corpus tokens). Empty
    documents are excluded (no tokens to profile).
    """
    from omniparser_spark.operators.dedup_text import normalized_text

    words = F.split(normalized_text(F.col(text_col)), " ")
    n_words = F.size(words)
    base = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            words.alias("_ws"),
            n_words.alias("n_words"),
            F.size(F.array_distinct(words)).alias("_n_distinct"),
        )
    )
    # sequence(1, 0) would generate DESCENDING [1, 0] for single-word
    # docs and 0 is an invalid element_at ordinal — guard to empty
    bigrams = F.when(
        F.size(F.col("_ws")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_ws")) - 1),
            lambda i: F.concat_ws(" ", F.element_at(F.col("_ws"), i),
                                  F.element_at(F.col("_ws"), i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        id_col, "n_words", "_n_distinct",
        F.explode(
            F.concat(
                F.transform(F.col("_ws"), lambda w: F.struct(
                    F.lit("w").alias("k"), w.alias("g"))),
                F.transform(bigrams, lambda b: F.struct(
                    F.lit("b").alias("k"), b.alias("g"))),
            )
        ).alias("_gram"),
    )
    counts = grams.groupBy(
        id_col, "n_words", "_n_distinct",
        F.col("_gram.k").alias("_k"), F.col("_gram.g").alias("_g"),
    ).count()
    per_doc = counts.groupBy(id_col, "n_words", "_n_distinct").agg(
        F.max(F.when(F.col("_k") == "w", F.col("count"))).alias("_top_w"),
        F.coalesce(
            F.max(F.when(F.col("_k") == "b", F.col("count"))), F.lit(0)
        ).alias("_top_b"),
    )
    nw = F.col("n_words").cast("double")
    nb = F.greatest(F.col("n_words") - 1, F.lit(0)).cast("double")
    return per_doc.select(
        id_col,
        "n_words",
        F.round(1 - F.col("_n_distinct") / nw, 6).alias("dup_word_frac"),
        F.round(F.col("_top_w") / nw, 6).alias("top_word_frac"),
        F.round(
            F.when(nb > 0, F.col("_top_b") / nb).otherwise(0.0), 6
        ).alias("top_bigram_frac"),
    )


# cp1252-mojibake repair pairs (artifact -> intended char): the
# classic "UTF-8 bytes read as cp1252" corruption. Three-byte
# punctuation artifacts are listed BEFORE two-byte accent artifacts —
# replacement is sequential and 'â€x' must not be half-eaten by the
# 'Ã?' rules. Pairs are generated as ch.encode('utf-8')
# .decode('cp1252'), i.e. byte-accurate, not hand-typed.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    ("â€™", "’"),  # ’
    ("â€œ", "“"),  # “
    ("â€“", "–"),  # –
    ("â€”", "—"),  # —
    ("â€¦", "…"),  # …
    ("Ã©", "é"),  # é
    ("Ã¨", "è"),  # è
    ("Ã¼", "ü"),  # ü
    ("Ã±", "ñ"),  # ñ
    ("Ã¶", "ö"),  # ö
    ("Ã¡", "á"),  # á
]

# zero-width + BOM characters and C0/DEL controls (except \t \n);
# NBSP normalizes to a plain space
_ZERO_WIDTH = "[​‌‍﻿]"
_CONTROLS = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"


def fix_text_artifacts(col) -> Column:
    """ftfy-lite: repair the high-frequency encoding damage web-scale
    text carries — cp1252 mojibake sequences back to their intended
    characters, zero-width/BOM characters stripped, NBSP to plain
    space, C0 controls (except tab/newline) stripped. A curated exact
    table, not a heuristic: every rule is byte-accurate and
    reversible-by-inspection, so the cleaner can never corrupt text
    that was already well-formed. Pure chained replace/regexp_replace
    column expressions — scan-bound, shuffle-free."""
    c = _c(col)
    for bad, good in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.replace(c, F.lit(" "), F.lit(" "))
    c = F.regexp_replace(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _CONTROLS, "")
    return c
