"""TF-IDF term scoring over a document corpus.

A training-data pipeline uses this for keyword extraction, topic
drift monitoring, and boilerplate detection (terms with huge document
frequency carry no signal — the same observation behind the n-gram
df-cap in dedup_text.py). No reference counterpart (omniparser is a
parser); north-rule training-data operator.

Scale shape: two hash aggregations (doc-term counts, then term document
frequencies — both map-side combinable) + one equi-join on term + a
per-doc top-k window. The term-frequency join is the skew point at
corpus scale (Zipf: 'the' appears in every doc): the df table has one
row per *distinct* term, so broadcast it when the vocabulary fits
(default here), or salt the join for open vocabularies. The per-doc
window sorts only within a document's own vocabulary — bounded, never a
global sort.

Determinism: ranking uses only integers (tf desc, df asc, term asc) so
top-k selection is engine-exact; the tfidf double is informational and
rounded (ln is correctly-rounded to <=1 ulp in both JVM and C libm —
at 4 dp the engines agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    broadcast_df_table: bool = True,
) -> DataFrame:
    """Top-k terms per document by term frequency (ties broken by rarer
    term, then lexicographic), with tf, document frequency, and the
    tf*ln(N/df) score."""
    tokens = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")

    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    if broadcast_df_table:
        dfq = F.broadcast(dfq)
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )

    scored = (
        tf.join(dfq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df_t",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_t")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df_t").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
