"""Mergeable-sketch operators with their error MEASURED, not assumed.

Sketches are the 100 TB workhorse: a Count-Min or HyperLogLog state is a
few KB per partition, merges associatively (map-side combine does the
heavy lifting), and answers frequency/cardinality questions without a
second corpus pass. The engine already exposes Spark's built-in sketches
(``approx_profiles``); this module builds the two classic sketches FROM
RELATIONAL PRIMITIVES so that (a) the DuckDB oracle replays them
bit-for-bit — every hash is md5-derived, every register update is a MAX /
SUM aggregate — and (b) each query carries its own accuracy audit against
the exact answer, turning the sketch guarantees into continuously-checked
numbers (the ``ann_recall_audit`` philosophy).

- ``cms_word_counts_audit`` — Count-Min (Cormode & Muthukrishnan 2005):
  depth×width counter grid, estimate = min over rows, one-sided
  overcount measured for the top-20 words.
- ``hll_cardinality_audit`` — HyperLogLog (Flajolet et al. 2007):
  256 max-rank registers over md5 bits, harmonic estimate + small-range
  correction, relative error vs the exact distinct count.
- ``dp_lang_counts`` — Laplace-mechanism noisy per-language counts
  (Dwork et al. 2006) with deterministic noise drawn from the portable
  hash (inverse-CDF), so the privacy mechanism's accuracy is itself
  oracle-checkable.

Float discipline: the HLL harmonic sum is computed as an INTEGER sum of
2^(RHO_CAP − rho) (exact in int64 by construction: ≤ m·2^RHO_CAP = 2^48)
and divided by 2^RHO_CAP once at the end — an exact power-of-two scale —
so the only true float ops are the final alpha·m²/harm division and ln(),
identical expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import PHASH_P, hex_mix_frag, phash_frag
from ..sources.io import load_table, spread

# -- Count-Min sketch ----------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows (md5 hex windows, disjoint)
CMS_WIDTH = 1 << 10  # counters per row
CMS_TOP = 20  # audited heavy hitters


_hex_mix_sql = hex_mix_frag  # shared portable fold (functions.hashing)


def cms_word_counts_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the corpus token stream with its
    one-sided error audited: build the depth×width grid, then report the
    top-20 exact heavy hitters with their CMS estimate and overcount
    (CMS never undercounts — pinned in the test suite).

    Plan: ONE token explode feeds (a) the exact heavy-hitter aggregate
    and (b) the grid — the grid build aggregates (row, position) keys,
    at most depth·width = 4096 cells however large the corpus, which is
    the sketch's whole point: the shuffle carries ≤ |partitions|·4096
    partial cells. The probe joins the 20 audited words against the
    4096-cell grid (broadcast) — never a second corpus scan."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
        ).alias("w")
    )
    # the vocabulary frame feeds SIX consumers (the grid, the top-20, and
    # four per-row probe branches); checkpoint it so the corpus explode
    # runs once — wc is vocabulary-sized, so the materialization is tiny
    # (review finding: 5 FileScans before, 1 after)
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact")).localCheckpoint()
    poses = [
        F.expr(_hex_mix_sql("md5(w)", i, CMS_WIDTH)) for i in range(CMS_DEPTH)
    ]
    cells = (
        wc.select(
            "exact",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"), poses[i].alias("pos")
                        )
                        for i in range(CMS_DEPTH)
                    ]
                )
            ).alias("c"),
        )
        .groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.sum("exact").alias("cell"))
    )
    top = (
        wc.orderBy(F.col("exact").desc(), F.col("w").asc())
        .limit(CMS_TOP)
        .select(
            "w",
            "exact",
            *[poses[i].alias(f"p{i}") for i in range(CMS_DEPTH)],
        )
    )
    est = None
    probed = top
    for i in range(CMS_DEPTH):
        ci = cells.filter(F.col("row") == i).select(
            F.col("pos").alias(f"p{i}"), F.col("cell").alias(f"c{i}")
        )
        probed = probed.join(F.broadcast(ci), f"p{i}")
        e = F.col(f"c{i}")
        est = e if est is None else F.least(est, e)
    return (
        probed.select(
            "w",
            "exact",
            est.alias("cms_estimate"),
            (est - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.col("exact").desc(), F.col("w").asc())
    )


def cms_word_counts_audit_oracle() -> str:
    pos_cols = ", ".join(
        f"{_hex_mix_sql('md5(w)', i, CMS_WIDTH)} AS p{i}"
        for i in range(CMS_DEPTH)
    )
    cell_joins = "\n".join(
        f"JOIN cells c{i} ON c{i}.row = {i} AND c{i}.pos = t.p{i}"
        for i in range(CMS_DEPTH)
    )
    least = "LEAST(" + ", ".join(f"c{i}.cell" for i in range(CMS_DEPTH)) + ")"
    return f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
),
wc AS (SELECT w, COUNT(*) AS exact, {pos_cols} FROM toks GROUP BY w),
cells AS (
    SELECT row, pos, CAST(SUM(exact) AS BIGINT) AS cell FROM (
        SELECT exact, unnest([{', '.join(f"{{'row': {i}, 'pos': p{i}}}" for i in range(CMS_DEPTH))}]) AS c
        FROM wc
    ) q CROSS JOIN LATERAL (SELECT c.row AS row, c.pos AS pos) s
    GROUP BY row, pos
),
top AS (
    SELECT * FROM wc ORDER BY exact DESC, w ASC LIMIT {CMS_TOP}
)
SELECT t.w, t.exact, {least} AS cms_estimate,
       {least} - t.exact AS overcount
FROM top t
{cell_joins}
ORDER BY t.exact DESC, t.w ASC
"""


# -- HyperLogLog ----------------------------------------------------------------

HLL_M = 256  # registers (first 2 md5 hex chars)
HLL_RHO_CAP = 40  # rank cap: keeps the harmonic sum an exact int64
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

_HEX = "0123456789abcdef"


def _rho_sql(md5_expr: str) -> str:
    """Rank (position of the first 1-bit, 1-based) of the 56-bit value in
    hex chars 3..16 of the digest, capped at HLL_RHO_CAP — pure string
    arithmetic (no hex→int conversion, which DuckDB lacks): walk the
    leading '0' run, then add the first non-zero nibble's leading-zero
    bits. Identical SQL text in both engines."""
    tail = f"substr({md5_expr}, 3, 14)"
    # TRIM(LEADING ... FROM ...) — the SQL-standard spelling; Spark's
    # two-arg ltrim(a, b) takes (trimStr, str), DuckDB's takes
    # (str, characters) — REVERSED, and the reversal silently strips the
    # whole tail in one engine (caught by the 2000-token growth test)
    stripped = f"TRIM(LEADING '0' FROM {tail})"
    # length of the leading '0' run in the 14-char tail
    zrun = f"(14 - length({stripped}))"
    first = f"substr({stripped}, 1, 1)"
    digit = f"(instr('{_HEX}', {first}) - 1)"
    nib_lz = (
        f"(CASE WHEN {digit} >= 8 THEN 0"
        f" WHEN {digit} >= 4 THEN 1"
        f" WHEN {digit} >= 2 THEN 2"
        f" WHEN {digit} >= 1 THEN 3"
        f" ELSE 4 END)"
    )
    rho = (
        f"(CASE WHEN length({stripped}) = 0 THEN {4 * 14 + 1}"
        f" ELSE 4 * {zrun} + {nib_lz} + 1 END)"
    )
    return f"LEAST({rho}, {HLL_RHO_CAP})"


def hll_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token cardinality with its error measured:
    256 max-rank registers over md5 bits, the harmonic-mean estimate
    (small-range corrected), the exact distinct count, and the relative
    error — one audit row. The expected |error| is 1.04/√256 ≈ 6.5%;
    the test suite pins the measured error inside 3× that bound.

    Plan: one token explode → per-register MAX aggregate (map-side
    combined: the shuffle carries ≤ |partitions|·256 partial registers
    however large the corpus — the mergeability that makes HLL the
    production cardinality tool). The harmonic sum is an exact int64
    (Σ 2^(40−rho) ≤ 2^48), so both engines divide the same integer by
    2^40 — float order cannot diverge them."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
        ).alias("w")
    )
    h = F.md5("w")
    bucket = (
        (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1)
    )
    rho = F.expr(_rho_sql("md5(w)"))
    regs = (
        toks.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    exact = toks.agg(F.countDistinct("w").alias("n_exact"))
    sums = regs.agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("m_rho")).cast(
                "bigint"
            )
        ).alias("hsum_int"),
        F.count(F.lit(1)).alias("v_used"),
    )
    harm = (
        (
            F.col("hsum_int")
            + (F.lit(HLL_M) - F.col("v_used")) * F.lit(1 << HLL_RHO_CAP)
        ).cast("double")
        / F.lit(float(1 << HLL_RHO_CAP))
    )
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / harm
    v_empty = (F.lit(HLL_M) - F.col("v_used")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty),
    ).otherwise(e_raw)
    return sums.crossJoin(F.broadcast(exact)).select(
        F.lit(HLL_M).alias("m"),
        F.col("v_used").alias("registers_used"),
        "n_exact",
        F.round(est, 3).alias("hll_estimate"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


def hll_cardinality_audit_oracle() -> str:
    rho = _rho_sql("md5(w)")
    return f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
),
regs AS (
    SELECT (instr('{_HEX}', substr(md5(w), 1, 1)) - 1) * 16
           + (instr('{_HEX}', substr(md5(w), 2, 1)) - 1) AS bucket,
           MAX({rho}) AS m_rho
    FROM toks GROUP BY 1
),
sums AS (
    SELECT CAST(SUM(CAST(pow(2.0, {HLL_RHO_CAP} - m_rho) AS BIGINT))
                AS BIGINT) AS hsum_int,
           COUNT(*) AS v_used
    FROM regs
),
exact AS (SELECT COUNT(DISTINCT w) AS n_exact FROM toks),
calc AS (
    SELECT v_used, n_exact,
           CAST(hsum_int + ({HLL_M} - v_used) * CAST({1 << HLL_RHO_CAP} AS BIGINT)
                AS DOUBLE) / {float(1 << HLL_RHO_CAP)!r} AS harm
    FROM sums CROSS JOIN exact
)
SELECT {HLL_M} AS m, v_used AS registers_used, n_exact,
       ROUND(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M!r} / harm
                       <= {2.5 * HLL_M!r}
                  AND CAST({HLL_M} - v_used AS DOUBLE) > 0
             THEN {float(HLL_M)!r}
                  * ln({float(HLL_M)!r} / CAST({HLL_M} - v_used AS DOUBLE))
             ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / harm END, 3)
           AS hll_estimate,
       ROUND((CASE WHEN {HLL_ALPHA * HLL_M * HLL_M!r} / harm
                        <= {2.5 * HLL_M!r}
                   AND CAST({HLL_M} - v_used AS DOUBLE) > 0
              THEN {float(HLL_M)!r}
                   * ln({float(HLL_M)!r} / CAST({HLL_M} - v_used AS DOUBLE))
              ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / harm END - n_exact)
             / n_exact, 6) AS rel_err
FROM calc
"""


# -- Laplace-mechanism noisy counts ----------------------------------------------

DP_EPSILON = 1.0  # per-query privacy budget; sensitivity 1 (count query)
DP_SEED = 71


def dp_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document counts through the Laplace mechanism
    (sensitivity-1 count, ε = 1) with the mechanism's accuracy audited:
    true count, noisy release, absolute error. The noise is drawn by
    inverse-CDF from the portable hash of the group key — deterministic,
    so the DP release pipeline itself is oracle-checkable (the standard
    seeded-noise trick for reproducible DP pipelines; a production
    deployment swaps in a secure RNG, changing nothing structural).

    Plan: one dimension-sized aggregate; noise is a row-local expression
    over the group key's md5 — nothing about the mechanism touches the
    corpus twice."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        F.expr(phash_frag(f"({_hex_mix_sql('md5(lang)', 0, PHASH_P)})", seed=DP_SEED))
        + F.lit(0.5)
    ) / F.lit(float(PHASH_P))
    b = 1.0 / DP_EPSILON
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    noisy = F.col("true_count") + noise
    return (
        counts.select(
            "lang",
            "true_count",
            F.round(noisy, 6).alias("noisy_count"),
            F.round(F.abs(noisy - F.col("true_count")), 6).alias("abs_err"),
        )
        .orderBy("lang")
    )


def dp_lang_counts_oracle() -> str:
    inner = _hex_mix_sql("md5(lang)", 0, PHASH_P)
    u = f"(({phash_frag(f'({inner})', seed=DP_SEED)}) + 0.5) / {float(PHASH_P)!r}"
    noise = (
        f"(-{1.0 / DP_EPSILON!r} * sign({u} - 0.5)"
        f" * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )
    return f"""
SELECT lang, COUNT(*) AS true_count,
       ROUND(COUNT(*) + {noise}, 6) AS noisy_count,
       ROUND(abs({noise}), 6) AS abs_err
FROM documents
GROUP BY lang
ORDER BY lang
"""
