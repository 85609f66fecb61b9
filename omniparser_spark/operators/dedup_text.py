"""Content deduplication family for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection over
a document table — the operations a 100 TB corpus pipeline needs, each
expressed so the expensive parts stay in the JVM and the only shuffles
are the ones the algorithm fundamentally requires (band bucket joins /
signature groupBys).

Hash primitive: ``h(s) = first-8-hex-of-md5(s) as int64`` — chosen over
``xxhash64`` so every signature is reproducible in any SQL engine
(DuckDB oracle parity), at identical plan shape/cost class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h(col: Column, seed: str = "") -> Column:
    """Engine-independent 32-bit hash as long (md5-prefix)."""
    x = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")


def normalized_text(col) -> Column:
    """Canonical text for dedup: lowercase, collapse whitespace, strip."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# ---------------------------------------------------------------- exact

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    hash-groupBy on md5(normalized text): one shuffle, map-side
    partial agg, output only groups with >1 member.
    """
    key = F.md5(normalized_text(text_col)).alias("content_hash")
    return (
        df.select(key, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical content."""
    key = F.md5(normalized_text(text_col))
    return (
        df.withColumn("_ch", key)
        .groupBy("_ch")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_r"))
        .select("_r.*")
    )


# ------------------------------------------------------------- shingles

def word_shingles(col, k: int = 3) -> Column:
    """k-word shingles as an array<string> (distinct)."""
    c = normalized_text(col)
    words = F.split(c, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )
    return F.when(n >= k, F.array_distinct(shingles)).otherwise(
        F.array(c)
    )


# ------------------------------------------------------- decontamination

def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Test-set decontamination: split the training corpus into
    (clean, contaminated), where a doc is contaminated iff it shares
    ANY word n-gram with the eval corpus (the standard 13-gram rule;
    docs shorter than n words match on their whole normalized text).

    Scale shape: the eval side is tiny relative to the corpus — its
    distinct n-grams BROADCAST into a semi-join against the corpus's
    exploded n-grams, so the corpus is scanned once and nothing
    pairwise ever materializes; cost is O(corpus tokens) + a broadcast
    of O(eval n-grams). Empty documents are never contaminated.
    """
    nonempty = F.length(F.trim(F.col(text_col))) > 0
    ev = (
        eval_docs.filter(nonempty)
        .select(F.explode(word_shingles(F.col(text_col), n)).alias("_g"))
        .distinct()
    )
    doc_grams = (
        docs.filter(nonempty)
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("_g"),
        )
    )
    hit_ids = (
        doc_grams.join(F.broadcast(ev), "_g").select(id_col).distinct()
    )
    clean = docs.join(hit_ids, id_col, "left_anti")
    contaminated = docs.join(hit_ids, id_col, "left_semi")
    return clean, contaminated


# -------------------------------------------------------------- minhash

MINHASH_P = 1_000_000_007  # 30-bit prime: a*x + b stays far inside int64


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic per-seed affine coefficients (a_i, b_i) mod P.

    Shared with the SQL oracle generator so signatures are reproducible
    in any engine."""
    import random

    rnd = random.Random(0x5EED)
    return [
        (rnd.randrange(1, MINHASH_P), rnd.randrange(0, MINHASH_P))
        for _ in range(num_hashes)
    ]


def minhash_signature(col, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature: per seed i, min over shingles of h_i(shingle)
    where h_i(s) = (a_i * h(s) + b_i) mod P — the base hash h (md5) is
    computed ONCE per shingle and the per-seed rehash is integer
    arithmetic, so cost is O(shingles + seeds * shingles-cheap) instead
    of O(seeds * md5).

    array<long> of length num_hashes; one pass over the shingle array
    per row, no shuffle, no UDF.
    """
    shingles = word_shingles(col, k)
    xs = F.transform(shingles, lambda s: _h(s) % MINHASH_P)

    def rehash(a: int, b: int):
        # NB: must be a 1-arg callable — pyspark maps extra lambda
        # params (incl. defaults) onto (element, index, ...) slots
        return lambda x: (x * a + b) % MINHASH_P

    sig = [
        F.array_min(F.transform(xs, rehash(a, b)))
        for a, b in minhash_params(num_hashes)
    ]
    return F.array(*sig)


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sig",
    num_hashes: int = 32,
    k: int = 3,
) -> DataFrame:
    """Staged MinHash: adds `out_col` (array<long> of num_hashes mins).

    Stages the hashed-shingle array as its own projection so the
    md5-per-shingle base pass runs ONCE per row; higher-order lambda
    expressions are interpreted (no whole-stage codegen), so Catalyst's
    project-collapse would otherwise inline the shingle pipeline into
    every per-seed min (num_hashes x md5 cost — measured 7x slower).
    """
    from omniparser_spark.operators.width import widen

    xs = F.transform(
        word_shingles(F.col(text_col), k), lambda s: _h(s) % MINHASH_P
    )

    def rehash(a: int, b: int):
        return lambda x: (x * a + b) % MINHASH_P

    # the md5-per-shingle pass is the expensive stage and chains onto
    # the scan; guarantee it cluster width (guide §2.6 — measured
    # 36 s -> 2 s at local[32] on a 2-split corpus)
    staged = widen(df).withColumn("_mh_xs", xs)
    mins = [
        F.array_min(F.transform("_mh_xs", rehash(a, b)))
        for a, b in minhash_params(num_hashes)
    ]
    return staged.withColumn(out_col, F.array(*mins)).drop("_mh_xs")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH.

    shingle -> minhash -> split signature into `bands` bands of
    r = num_hashes/bands rows -> bucket-join on (band_idx, band_hash).
    Only the band explode shuffles; pair generation is a self-join on
    the bucket key (equi-join, AQE-skew-splittable). Returns distinct
    (id_a < id_b) candidate pairs with their estimated jaccard from
    full-signature agreement.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    base = with_minhash_signature(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col,
        out_col="sig",
        num_hashes=num_hashes,
        k=k,
    ).select("doc_id", "sig")

    banded = base.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(*[
                F.md5(F.array_join(F.slice("sig", b * r + 1, r), ","))
                for b in range(bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(num_hashes)
    )
    return pairs.select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))


# --------------------------------------------------------------- simhash

def _simhash_bit_counts(hashes: Column, bits: int) -> Column:
    """ONE pass over the word-hash array: fold into a `bits`-counter
    array (counter b = how many word hashes have bit b set). The
    earlier per-bit formulation re-aggregated the array once per bit
    (32 interpreted passes/row); the single fold is measured ~1.4x
    faster at identical results."""
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    return F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, b).bitwiseAND(F.lit(1))
                    for b in range(bits)
                ]
            ),
            lambda a, x: a + x,
        ),
    )


def _simhash_from_counts(ones: Column, n: Column, bits: int) -> Column:
    """Majority vote per bit -> packed long fingerprint."""
    out = None
    for b in range(bits):
        e = F.when(
            F.get(ones, b) * 2 > n, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        out = e if out is None else out + e
    return out


def simhash(col, bits: int = 32) -> Column:
    """SimHash over words: bit b of the result is 1 iff the sum over
    words of (+1 if bit b of h(word) else -1) is positive.

    Single-pass bit-count fold via F.aggregate over the word array —
    no UDF, no shuffle (see :func:`_simhash_bit_counts`).
    """
    words = F.split(normalized_text(col), " ")
    hashes = F.transform(words, lambda w: _h(w))
    ones = _simhash_bit_counts(hashes, bits)
    return _simhash_from_counts(ones, F.size(hashes).cast("long"), bits)


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "sh", bits: int = 32
) -> DataFrame:
    """Staged SimHash: adds `out_col` (long fingerprint).

    Same staging rationale as :func:`with_minhash_signature` — the
    bit-count array is projected once so the md5 word-hash pass and the
    fold don't get inlined into every majority-vote term.
    """
    from omniparser_spark.operators.width import widen

    words = F.split(normalized_text(F.col(text_col)), " ")
    hashes = F.transform(words, lambda w: _h(w))
    # same width guard as with_minhash_signature: the md5-per-word
    # fold must not ride a 1-2 split scan
    staged = widen(df).withColumn(
        "_sh_ones", _simhash_bit_counts(hashes, bits)
    ).withColumn("_sh_n", F.size(hashes).cast("long"))
    out = _simhash_from_counts(F.col("_sh_ones"), F.col("_sh_n"), bits)
    return staged.withColumn(out_col, out).drop("_sh_ones", "_sh_n")


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dups by SimHash with block-permutation candidate pruning:
    split the fingerprint into n_blocks blocks; by pigeonhole any pair
    within max_hamming (< n_blocks) shares at least one exact block ->
    equi-join per block, then verify full hamming distance."""
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    base = with_simhash(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col,
        out_col="sh",
        bits=bits,
    ).select("doc_id", "sh")
    blocked = base.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftright("sh", i * block_bits).bitwiseAND(F.lit(mask))
                for i in range(n_blocks)
            ])
        ).alias("block_idx", "block_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming_distance(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# -------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle inverted index:
    explode shingles -> self-join on shingle (counts intersections) ->
    |A∩B| / (|A| + |B| - |A∩B|). The inverted-index join only pairs
    documents sharing at least one shingle — never the full n^2.

    ``max_df`` is the scale guard: a shingle appearing in more than
    `max_df` documents (boilerplate headers, "thank you for ...") is
    dropped from the shingle universe BEFORE the self-join — a stop
    shingle in 10^6 docs otherwise creates 10^12 join rows. Jaccard is
    then computed over the capped universe consistently (both
    intersection and per-doc sizes exclude dropped shingles), the
    standard df-cap used by corpus-dedup pipelines. Dropped-shingle
    volume is observable: compare sum(n_sh) against the uncapped run.
    The cap costs one extra map-side-combinable aggregate + equi-join,
    both on the same `shingle` key the self-join shuffles on anyway.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    if max_df is None:
        # uncapped: per-doc size comes free from the array, no extra agg
        inv = base.withColumn("n_sh", F.size("sh")).select(
            "doc_id", "n_sh", F.explode("sh").alias("shingle")
        )
    else:
        inv = base.select("doc_id", F.explode("sh").alias("shingle"))
        # shingles are distinct per doc, so count(*) == document freq
        freq = inv.groupBy("shingle").agg(F.count("*").alias("_df"))
        inv = inv.join(freq.filter(F.col("_df") <= max_df), "shingle").drop(
            "_df"
        )
        sizes = inv.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        inv = inv.join(sizes, "doc_id")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.count("*").alias("n_inter"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def dedup_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """CCNet-style cross-document LINE deduplication: a line
    (paragraph) whose normalized form appears in >= `min_df` DISTINCT
    documents is boilerplate (nav bars, cookie banners, license
    footers) and is removed from EVERY document — CCNet removes all
    copies rather than keeping one, because a recurring line is noise
    wherever it appears.

    Returns ``(id_col, text, n_lines, n_removed)`` with `text`
    reassembled from the surviving lines in original order (empty
    string when everything was boilerplate). Blank/whitespace-only
    lines are structural, never counted or removed.

    Scale shape (three bounded shuffles, all O(corpus lines)):
    1. posexplode lines (narrow) -> distinct (doc, line-md5) ->
       count distinct docs per line hash (map-side combinable);
    2. flagged set = hashes with df >= min_df — typically tiny
       relative to the corpus (threshold-crossing lines only), so it
       BROADCASTS to the line stream; a pathological flagged set
       degrades to a shuffle hash join, never quadratic;
    3. per-doc reassembly: one groupBy(id) with an in-aggregate
       array_sort on (pos, line) — bounded by doc size, no global
       sort.

    The md5 is an internal shuffle-width optimization: equality on
    the 16-byte digest stands in for equality on the normalized line.
    """
    from omniparser_spark.operators.width import widen

    lines = widen(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "_pos", "_line"
        ),
    ).withColumn(
        "_key",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("_line")), r"\s+", " "))
        ),
    ).withColumn(
        "_blank",
        F.length(F.trim(F.col("_line"))) == 0,
    )
    flagged = (
        lines.filter(~F.col("_blank"))
        .groupBy("_key")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_key", F.lit(True).alias("_boiler"))
    )
    marked = lines.join(F.broadcast(flagged), "_key", "left").withColumn(
        "_rm", F.coalesce(F.col("_boiler"), F.lit(False)) & ~F.col("_blank")
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lines"),
            F.sum(F.when(F.col("_rm"), 1).otherwise(0))
            .cast("int")
            .alias("n_removed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_rm"),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s.getField("_line"),
                ),
            ).alias(text_col),
        )
        .select(id_col, text_col, "n_lines", "n_removed")
    )


# ------------------------------------------------- duplicated substrings

def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-SUBSTRING detection (the ExactSubstr operation
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): find, per document, the maximal token spans whose every
    k-token window also occurs elsewhere in the corpus (or again in
    the same document). Document-level dedup misses these — boilerplate
    headers, license blocks, quoted replies — and the paper's finding
    is that removing the SPAN, not the document, is what improves the
    model.

    The reference implementation builds a corpus-wide suffix array —
    inherently single-machine. The equivalent on Spark: k-token
    rolling windows hashed per position (one narrow pass), a global
    hash count (map-side combinable — at most one row per distinct
    window survives the combine), an inner join of positions against
    the DUPLICATED hashes only (the small side), then a per-document
    gaps-and-islands window to merge overlapping windows ([i, i+k-1]
    and [j, ...] overlap iff j <= i+k) into maximal spans. Every stage
    hash-partitions; nothing is all-pairs, nothing is O(corpus^2).

    Returns (id_col, start_tok, end_tok, n_windows): 1-based inclusive
    token positions of each maximal duplicated span. Documents shorter
    than k tokens have no windows and are absent. min_count=2 flags
    anything seen twice; raise it to only strip heavy boilerplate.
    """
    from pyspark.sql import Window

    from omniparser_spark.operators.width import widen

    toks = F.split(normalized_text(F.col(text_col)), " ")
    # the per-position window-md5 projection below is the hot stage —
    # give it cluster width instead of the corpus scan's 1-2 splits
    base = (
        widen(df).filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), toks.alias("_ws"))
        .filter(F.size("_ws") >= k)
    )
    sh = base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_ws") - k + 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("_ws", i, k))
                ),
            )
        ).alias("_z", "_h"),
    ).select(id_col, (F.col("_z") + 1).alias("i"), "_h")
    dup = (
        sh.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_h")
    )
    hits = sh.join(dup, "_h").select(id_col, "i")
    w = Window.partitionBy(id_col).orderBy("i")
    brk = F.when(
        F.col("i") > F.lag("i").over(w) + k, F.lit(1)
    ).otherwise(F.lit(0))
    grouped = hits.withColumn("_brk", brk).withColumn(
        "_gid",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        grouped.groupBy(id_col, "_gid")
        .agg(
            F.min("i").cast("int").alias("start_tok"),
            (F.max("i") + k - 1).cast("int").alias("end_tok"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .drop("_gid")
    )


def strip_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY the substring dedup: rewrite each document with every
    token covered by a :func:`duplicate_spans` span removed (Lee et
    al. drop every occurrence of a duplicated substring — removing
    both copies measurably improves the trained model vs keeping one).

    Returns every input document (normalized) as (id_col, text_deduped,
    n_tokens_removed, n_tokens_kept); span-free documents pass through
    with n_tokens_removed = 0, and empty/whitespace-only documents pass
    through as ('', 0, 0) — they have no tokens, not one empty token
    (ADVICE r6: previously they were dropped from the output entirely,
    contradicting this contract). The rewrite is a per-token positional
    filter against the doc's own span list (collected per doc — spans
    per doc are few by construction), so beyond duplicate_spans' plan
    this adds one groupBy of the spans and one left join back: still
    nothing all-pairs, still hash-partitioned on the doc id.
    """
    spans = (
        duplicate_spans(df, k=k, min_count=min_count,
                        id_col=id_col, text_col=text_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("start_tok").alias("s"),
                         F.col("end_tok").alias("e"))
            ).alias("_spans")
        )
    )
    from omniparser_spark.operators.width import widen

    toks = F.split(normalized_text(F.col(text_col)), " ")
    # empty/whitespace docs carry ZERO tokens (split('') would yield
    # one empty token and miscount n_tokens_kept as 1)
    base = widen(df).select(
        F.col(id_col),
        F.when(
            F.length(F.trim(F.col(text_col))) > 0, toks
        ).otherwise(F.array().cast("array<string>")).alias("_ws"),
    )
    joined = base.join(spans, id_col, "left").withColumn(
        "_spans",
        F.coalesce(F.col("_spans"), F.array().cast(
            "array<struct<s:int,e:int>>"
        )),
    )
    # two-arg filter lambda: i is the 0-based position; spans are
    # 1-based inclusive token ranges
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda sp: (i + 1 >= sp.getField("s"))
        & (i + 1 <= sp.getField("e")),
    )
    kept = F.filter(F.col("_ws"), lambda x, i: ~covered(i))
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("text_deduped"),
        (F.size("_ws") - F.size(kept)).cast("int").alias(
            "n_tokens_removed"
        ),
        F.size(kept).cast("int").alias("n_tokens_kept"),
    )
