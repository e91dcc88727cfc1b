"""Recommender split/sampling operators — SURVEY.md §2.2 E1–E5.

Re-expresses the reference's per-user Python loops (``Dataset_CDAE.py:58-145``)
as single-pass window/anti-join DataFrame plans. Each public function has a
matching ``*_ORACLE`` SQL string evaluating to the identical result in DuckDB
(same portable hash, same tie-breaks), which is what makes these operators
correctness-gateable.

Scale notes (100 TB design):
- Every operator is one shuffle on (user_id, domain) — the natural key. No
  driver-side loops, no collect, no dense matrices (the reference's
  ``csr.toarray()`` at ``main_my.py:83`` is the scalability wall we remove).
- Negative sampling here materializes the per-domain item dimension and
  anti-joins; the item dim is broadcast (it is tiny relative to interactions:
  catalog ≪ interaction log). At extreme catalog sizes, switch to
  sample-and-reject (sample ~k·(1+ε) candidate ids by hash, anti-join, keep
  first 99) — same output contract.
- Skew: power-law users make the per-user windows skewed; AQE skew handling is
  on by default in session.py, and the window key (user_id, domain) has far
  higher cardinality than executor count, so stragglers are bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import phash_frag
from ..sources.io import RATINGS_SQL, ratings

SPLIT_SEED = 2020  # reference split/negative seed (Dataset_CDAE.py:103,111)
PERCENT_SEED = 72  # reference partial-train seed (Dataset_CDAE.py:79)
N_NEGATIVES = 99  # reference protocol (Dataset_CDAE.py:110-111)


# -- E1: cardinalities -------------------------------------------------------

def cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-entity counts per domain (reference ``Dataset_CDAE.py:14-16``:
    ``num_user/num_movie/num_book = len(dict)``).

    At 100 TB use ``approx_count_distinct`` — exact distinct is a full
    shuffle; the approximate HLL sketch is one pass, mergeable, <2% error.
    The oracle-checked variant stays exact so hashes match.
    """
    r = ratings(spark, sf_dir)
    return (
        r.groupBy("domain")
        .agg(
            F.countDistinct("user_id").alias("num_users"),
            F.countDistinct("item_id").alias("num_items"),
            F.count(F.lit(1)).alias("num_interactions"),
        )
        .orderBy("domain")
    )


CARDINALITIES_ORACLE = f"""
WITH ratings AS ({RATINGS_SQL})
SELECT domain,
       COUNT(DISTINCT user_id) AS num_users,
       COUNT(DISTINCT item_id) AS num_items,
       COUNT(*) AS num_interactions
FROM ratings
GROUP BY domain
ORDER BY domain
"""


# -- E2 + E4: leave-two-out split with the reference's train rules -----------

def _ranked_ratings(r: DataFrame) -> DataFrame:
    """ratings + per-(user,domain) shuffle rank and group size.

    The rank order replaces ``sklearn.utils.shuffle(items, random_state=2020)``
    (``Dataset_CDAE.py:103,116``) with the portable seeded hash; item_id is
    the tie-break, matching argsort stability semantics.
    """
    w = Window.partitionBy("user_id", "domain")
    order_key = F.expr(phash_frag("user_id", "item_id", seed=SPLIT_SEED))
    return r.withColumn(
        "rn", F.row_number().over(w.orderBy(order_key.asc(), F.col("item_id").asc()))
    ).withColumn("cnt", F.count(F.lit(1)).over(w))


def splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-two-out split (reference ``Dataset_CDAE.py:100-124`` + the train
    purge of ``Dataset_CDAE.py:72-77``), all reference quirks preserved:

    - shuffled item[0] -> vali, item[1] -> test;
    - singleton users: the single item is BOTH vali and test
      (``Dataset_CDAE.py:106-108``);
    - train = items minus vali, minus test *only when the user has >2 items*
      — for exactly-2-item users the test item leaks into train
      (``Dataset_CDAE.py:73-77``).

    Output: (user_id, item_id, domain, split) — duplicated item rows across
    splits exactly where the quirks demand it.
    """
    ranked = _ranked_ratings(ratings(spark, sf_dir))
    vali = ranked.filter(F.col("rn") == 1).select(
        "user_id", "item_id", "domain", F.lit("vali").alias("split")
    )
    test = ranked.filter(
        ((F.col("cnt") >= 2) & (F.col("rn") == 2))
        | ((F.col("cnt") == 1) & (F.col("rn") == 1))
    ).select("user_id", "item_id", "domain", F.lit("test").alias("split"))
    train = ranked.filter(
        (F.col("rn") >= 3) | ((F.col("cnt") == 2) & (F.col("rn") == 2))
    ).select("user_id", "item_id", "domain", F.lit("train").alias("split"))
    return vali.unionByName(test).unionByName(train)


_RANKED_CTE = f"""
ranked AS (
    SELECT user_id, item_id, domain,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, domain
               ORDER BY {phash_frag("user_id", "item_id", seed=SPLIT_SEED)} ASC,
                        item_id ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY user_id, domain) AS cnt
    FROM ratings
)
"""

SPLITS_ORACLE = f"""
WITH ratings AS ({RATINGS_SQL}),
{_RANKED_CTE}
SELECT user_id, item_id, domain, 'vali' AS split FROM ranked WHERE rn = 1
UNION ALL
SELECT user_id, item_id, domain, 'test' AS split FROM ranked
WHERE (cnt >= 2 AND rn = 2) OR (cnt = 1 AND rn = 1)
UNION ALL
SELECT user_id, item_id, domain, 'train' AS split FROM ranked
WHERE rn >= 3 OR (cnt = 2 AND rn = 2)
"""


# -- E3: negative sampling ---------------------------------------------------

def negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """99 never-interacted items per (user, domain), deterministic
    (reference ``Dataset_CDAE.py:110-111,123-124``:
    ``shuffle(set(range(num_item)) - set(items), seed=2020)[:99]``).

    Plan: per-domain item dimension (distinct item_id — broadcast-sized) ×
    per-domain users, anti-join the interactions, rank by seeded hash, keep
    the first 99. The expanded candidate set is |users| × |catalog| *per
    domain* before the anti-join; at very large catalogs switch to
    sample-and-reject (see module docstring) — the output contract (ranked
    99 per user) is unchanged.
    """
    r = ratings(spark, sf_dir)
    items = r.select("domain", "item_id").distinct()
    users = r.select("domain", "user_id").distinct()
    cand = (
        users.join(F.broadcast(items), "domain")
        .join(r, ["user_id", "item_id", "domain"], "left_anti")
    )
    order_key = F.expr(phash_frag("user_id", "item_id", seed=SPLIT_SEED))
    w = Window.partitionBy("user_id", "domain").orderBy(
        order_key.asc(), F.col("item_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= N_NEGATIVES)
        .select("user_id", "item_id", "domain", F.col("rank").cast("int").alias("rank"))
    )


NEGATIVES_ORACLE = f"""
WITH ratings AS ({RATINGS_SQL}),
items AS (SELECT DISTINCT domain, item_id FROM ratings),
users AS (SELECT DISTINCT domain, user_id FROM ratings),
cand AS (
    SELECT u.user_id, i.item_id, u.domain
    FROM users u
    JOIN items i ON u.domain = i.domain
    WHERE NOT EXISTS (
        SELECT 1 FROM ratings r
        WHERE r.user_id = u.user_id
          AND r.item_id = i.item_id
          AND r.domain = u.domain
    )
),
ranked AS (
    SELECT user_id, item_id, domain,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, domain
               ORDER BY {phash_frag("user_id", "item_id", seed=SPLIT_SEED)} ASC,
                        item_id ASC
           ) AS rank
    FROM cand
)
SELECT user_id, item_id, domain, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {N_NEGATIVES}
"""


# -- E5: per-user percent subsampling of the train split ---------------------

def percent_sample(
    spark: SparkSession, sf_dir: str, percent: float = 0.5
) -> DataFrame:
    """Keep the first ``round(percent * n)`` train items per (user, domain),
    ordered by a seed-72 hash (reference ``Dataset_CDAE.py:79-84``:
    ``shuffle(items, random_state=72)[:int(round(percent * len))]``).

    Spark and DuckDB both round halves away from zero, so the cutoff is
    portable (Python's banker's rounding in the reference differs on exact
    .5 boundaries — a documented semantic divergence, SURVEY.md §7.4).
    """
    tr = splits(spark, sf_dir).filter(F.col("split") == "train")
    w = Window.partitionBy("user_id", "domain")
    order_key = F.expr(phash_frag("user_id", "item_id", seed=PERCENT_SEED))
    return (
        tr.withColumn(
            "srn",
            F.row_number().over(w.orderBy(order_key.asc(), F.col("item_id").asc())),
        )
        .withColumn("scnt", F.count(F.lit(1)).over(w))
        .filter(F.col("srn") <= F.round(F.lit(percent) * F.col("scnt")))
        .select("user_id", "item_id", "domain")
    )


def percent_sample_oracle(percent: float = 0.5) -> str:
    return f"""
WITH ratings AS ({RATINGS_SQL}),
{_RANKED_CTE},
train AS (
    SELECT user_id, item_id, domain FROM ranked
    WHERE rn >= 3 OR (cnt = 2 AND rn = 2)
),
sranked AS (
    SELECT user_id, item_id, domain,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, domain
               ORDER BY {phash_frag("user_id", "item_id", seed=PERCENT_SEED)} ASC,
                        item_id ASC
           ) AS srn,
           COUNT(*) OVER (PARTITION BY user_id, domain) AS scnt
    FROM train
)
SELECT user_id, item_id, domain
FROM sranked
WHERE srn <= ROUND({percent} * scnt)
"""
