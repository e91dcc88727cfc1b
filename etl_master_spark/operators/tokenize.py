"""Tokenizer-training / lexical-statistics operators.

The reference has no text surface (SURVEY.md §2.8); this module extends the
driver-mandated text family with the statistics a tokenizer-training job
(BPE/WordPiece) and a phrase-mining pass compute over a corpus:

- ``bpe_merge_candidates`` — the first iteration of BPE training (Sennrich
  et al. 2016): adjacent symbol-pair frequencies over the word-frequency
  dictionary, with the classic ``</w>`` end-of-word marker. Real BPE
  training is sequential over merges, but every iteration is exactly this
  aggregation — the expensive, data-proportional part — so the distributed
  primitive is what matters at 100 TB.
- ``pmi_collocations`` — pointwise mutual information over adjacent word
  bigrams (Church & Hanks 1990), the standard phrase-mining score used to
  add multi-word units to vocabularies.
- ``char_entropy_scores`` — per-document character-distribution Shannon
  entropy, the cheap gibberish / encoding-damage filter (low entropy =
  repeated chars, high = random bytes) used alongside the Gopher-style
  quality flags in ``text.quality_scores``.

Scale design: every operator is explode → map-side-combined aggregation —
the ``word_counts`` shape. The BPE pair pass aggregates over the REDUCED
word-frequency dictionary (|vocabulary| rows, not |corpus| tokens), exactly
how production BPE trainers avoid rescanning the corpus per merge. PMI joins
the bigram frame to a vocabulary-sized unigram frame (AQE broadcasts it
while it fits). Nothing leaves the JVM; every expression is portable SQL so
the DuckDB oracle replays the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table, spread

TOP_PAIRS = 50  # BPE merge candidates returned
PMI_MIN_COUNT = 5  # collocation support floor (standard PMI noise guard)
TOP_COLLOCATIONS = 50
EOW = "</w>"  # BPE end-of-word marker (Sennrich et al. 2016)


def _words(col):
    return F.filter(F.split(col, " "), lambda w: w != F.lit(""))


# -- BPE merge candidates -----------------------------------------------------

def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character-pair merge candidates over the corpus
    word-frequency dictionary — iteration 1 of BPE training, the
    aggregation every merge step repeats.

    Plan: ONE corpus scan builds the word-frequency dictionary
    (map-side-combined groupBy — Zipf skew collapses to |partitions|
    partial rows per hot word); the pair explosion then runs over the
    REDUCED |vocabulary| frame, so per-merge cost is independent of corpus
    size — the property that makes BPE trainable at 100 TB. Pairs are
    built row-locally with sequence→transform (all JVM); a length-1 word
    contributes only its ``(char, </w>)`` marker pair. The guard matters:
    Spark's ``sequence(1, 0)`` would DESCEND, fabricating a reversed
    range. Two-level aggregate (pair,word → pair) instead of
    COUNT(DISTINCT) avoids the expand-operator row doubling."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select(F.explode(_words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    L = F.length("w")
    inner = F.when(
        L >= 2,
        F.transform(
            F.sequence(F.lit(1), L - 1),
            lambda i: F.struct(
                F.col("w").substr(i, F.lit(1)).alias("l"),
                F.col("w").substr(i + 1, F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    marker = F.struct(
        F.col("w").substr(L, F.lit(1)).alias("l"), F.lit(EOW).alias("r")
    )
    pairs = wc.select(
        "w", "c", F.explode(F.concat(inner, F.array(marker))).alias("p")
    )
    per_word = pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"), "w"
    ).agg(F.sum("c").alias("oc"))
    return (
        per_word.groupBy("left_sym", "right_sym")
        .agg(
            F.sum("oc").alias("occurrences"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .orderBy(
            F.col("occurrences").desc(),
            F.col("left_sym").asc(),
            F.col("right_sym").asc(),
        )
        .limit(TOP_PAIRS)
    )


BPE_MERGE_CANDIDATES_ORACLE = f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
pairs AS (
    SELECT w, c,
           unnest(list_concat(
               CASE WHEN length(w) >= 2
                    THEN list_transform(range(1, length(w)),
                         i -> {{'l': substr(w, i, 1), 'r': substr(w, i + 1, 1)}})
                    ELSE [] END,
               [{{'l': substr(w, length(w), 1), 'r': '{EOW}'}}])) AS p
    FROM wc
),
per_word AS (
    SELECT p.l AS left_sym, p.r AS right_sym, w, SUM(c) AS oc
    FROM pairs GROUP BY 1, 2, 3
)
SELECT left_sym, right_sym, CAST(SUM(oc) AS BIGINT) AS occurrences,
       COUNT(*) AS n_words
FROM per_word
GROUP BY left_sym, right_sym
ORDER BY occurrences DESC, left_sym ASC, right_sym ASC
LIMIT {TOP_PAIRS}
"""


# -- PMI collocations ----------------------------------------------------------

def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-bigram collocations by pointwise mutual information,
    support ≥ 5 — the phrase-mining pass that promotes multi-word units
    into a tokenizer vocabulary.

    PMI = ln( p(ab) / (p(a)·p(b)) ) with p from corpus-wide unigram /
    bigram totals. The division order inside ln() is written identically
    in both engines so the doubles agree bit-for-bit before the 6-dp
    round (products of large counts are avoided — c·N² would leave
    float64's exact-integer range at corpus scale).

    Plan: the ``word_counts`` / ``bigram_counts`` aggregations (map-side
    combined), then two joins of the bigram frame against the
    vocabulary-sized unigram frame — AQE broadcasts it while it fits; at
    100 TB the vocabulary is still millions of rows, a shuffle-hash join
    on a uniform key. Totals are 1-row broadcasts."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = _words(F.col("text"))
    uni = (
        docs.select(F.explode(words).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        docs.select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .filter(F.col("cb") >= PMI_MIN_COUNT)
    )
    n1 = uni.agg(F.sum("cu").cast("double").alias("n1"))
    n2_src = docs.select(
        F.greatest(F.size(words) - 1, F.lit(0)).alias("nb")
    )
    n2 = n2_src.agg(F.sum("nb").cast("double").alias("n2"))
    u1 = uni.select(F.col("g").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("g").alias("w2"), F.col("cu").alias("c2"))
    pmi = F.log(
        (F.col("cb") / F.col("n2"))
        / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("cb").alias("pair_count"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(TOP_COLLOCATIONS)
    )


PMI_COLLOCATIONS_ORACLE = f"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS words
    FROM documents
),
uni AS (
    SELECT g, COUNT(*) AS cu FROM (SELECT unnest(words) AS g FROM w) GROUP BY g
),
bi AS (
    SELECT w1, w2, COUNT(*) AS cb FROM (
        SELECT unnest(list_transform(range(1, len(words)),
                      i -> {{'w1': words[i], 'w2': words[i + 1]}})) AS p
        FROM w WHERE len(words) >= 2
    ) q
    CROSS JOIN LATERAL (SELECT p.w1 AS w1, p.w2 AS w2) s
    GROUP BY w1, w2
    HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
n1 AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n1 FROM uni),
n2 AS (
    SELECT CAST(SUM(CASE WHEN len(words) >= 2 THEN len(words) - 1 ELSE 0 END)
                AS DOUBLE) AS n2
    FROM w
)
SELECT bi.w1, bi.w2, bi.cb AS pair_count,
       ROUND(ln((bi.cb / n2.n2) / ((u1.cu / n1.n1) * (u2.cu / n1.n1))), 6)
           AS pmi
FROM bi
JOIN uni u1 ON u1.g = bi.w1
JOIN uni u2 ON u2.g = bi.w2
CROSS JOIN n1 CROSS JOIN n2
ORDER BY pmi DESC, bi.w1 ASC, bi.w2 ASC
LIMIT {TOP_COLLOCATIONS}
"""


# -- per-document character entropy -------------------------------------------

def char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats) plus
    character accounting — the gibberish / encoding-damage / repeated-
    filler filter (near-zero entropy = one repeated char; text damaged
    into random bytes scores far above natural language's ~3 nats).

    H = ln(n) − (Σ c·ln c)/n over per-doc character counts — the one-
    aggregate spelling (no second pass for the total, no window). The
    char explode is narrow; the only shuffle is the (doc, char) partial
    aggregate, map-side combined, bounded by |alphabet| per doc.

    Portability note: Spark splits strings into UTF-16 code units while
    DuckDB splits into codepoints — identical for the BMP (this corpus is
    ASCII; CJK is also BMP-safe), diverging only on astral-plane chars
    (emoji), which a production deployment would pre-filter or map via
    a codepoint-explode. Documented, not hidden."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chars = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    s = F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            F.count(F.lit(1)).alias("distinct_chars"),
            F.round(F.log(n) - s / n, 6).alias("char_entropy"),
        )
        # no output sort: per-doc feature table (event_gaps contract)
    )


CHAR_ENTROPY_SCORES_ORACLE = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
    SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch <> '' GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       COUNT(*) AS distinct_chars,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE), 6) AS char_entropy
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


# -- tokenizer fertility by language -------------------------------------------

def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: subword tokens per whitespace
    word and characters per subword token under the BPE-ish regex
    pre-tokenizer — the standard multilingual-tokenizer health metric
    (fertility far above ~1.3 for a language means its text costs
    disproportionate sequence length, skewing mixture budgets).

    One narrow scan; the three counts are JVM regex builtins evaluated in
    the projection and the per-language aggregate is dimension-sized.
    Ratios divide the SUMS (corpus-level fertility), not the mean of
    per-doc ratios — the estimator mixture-budget math actually needs."""
    from .text import BPEISH_RE

    # spread before the regex-heavy projection: the driver's single-file
    # scan would otherwise run the per-row regex work on one core
    docs = spread(load_table(spark, sf_dir, "documents"))
    bpe = F.expr(f"regexp_extract_all(text, '{BPEISH_RE}', 0)")
    words = _words(F.col("text"))
    per = docs.select(
        "lang",
        F.length("text").alias("chars"),
        F.size(words).alias("ws"),
        F.size(bpe).alias("bp"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bp").alias("bpeish_tokens"),
            F.round(
                F.sum("bp") / F.sum("ws").cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.sum("chars") / F.sum("bp").cast("double"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def tokenizer_fertility_oracle() -> str:
    from .text import BPEISH_RE

    return f"""
WITH per AS (
    SELECT lang,
           length(text) AS chars,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws,
           len(regexp_extract_all(text, '{BPEISH_RE}')) AS bp
    FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bp) AS BIGINT) AS bpeish_tokens,
       ROUND(SUM(bp) / CAST(SUM(ws) AS DOUBLE), 6) AS fertility,
       ROUND(SUM(chars) / CAST(SUM(bp) AS DOUBLE), 6) AS chars_per_token
FROM per
GROUP BY lang
ORDER BY lang
"""
