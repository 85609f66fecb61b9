"""PII redaction and text chunking — training-data hygiene operators.

Both are pure column expressions (whole-stage codegen, shuffle-free,
scan-bound at 100 TB). Patterns are intentionally conservative RE2-
compatible classes (no lookaround) so the same regex runs identically
in the JVM, DuckDB, and RE2-based scanners — redaction must behave the
same in every engine that touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: longest/most-specific first so a partial match does
# not break a longer one (card before phone: both are digit runs)
PII_PATTERNS: list[tuple[str, str]] = [
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 13-19 digit card-like runs with optional space/dash groups
    (r"\b(?:\d[ -]?){13,19}\b", "<CARD>"),
    # US-ish SSN
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # phone-like: optional +country, 7-12 digits with separators
    (r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b", "<PHONE>"),
    # IPv4
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(col) -> Column:
    """Replace email/card/SSN/phone/IP literals with typed placeholders
    (the standard pre-training scrub). Chained regexp_replace — one
    codegen stage, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def chunk_text(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap_words: int = 16,
):
    """Split documents into fixed-size word-window chunks with overlap
    (LLM context packing). One row per chunk: (id, chunk_idx, chunk,
    n_words). Pure array expressions: split -> sequence of window
    starts -> slice -> posexplode; no shuffle, chunk count bounded by
    ceil(words/stride).

    The last window starts at the final stride boundary before the end
    of the document, so every word appears in at least one chunk and
    trailing fragments are not dropped.
    """
    stride = chunk_words - overlap_words
    if stride <= 0:
        raise ValueError("chunk_words must exceed overlap_words")
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(ws)
    # start indices 0, stride, 2*stride, ... while start < n
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((n - 1) / F.lit(stride)).cast("int") * F.lit(stride),
        ),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(
            F.slice(ws, s + 1, F.lit(chunk_words)), " "
        ),
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .withColumn("n_words", F.size(F.split(F.col("chunk"), r"\s+")))
    )
