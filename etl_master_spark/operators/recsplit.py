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

from ..functions.hashing import phash_col, phash_frag
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


def domain_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-domain user-overlap profile — the reference's premise made
    measurable: the SAME user ids key both domain dicts
    (``Dataset_CDAE.py:26-33``), and the whole method rests on the 'both'
    segment. Per segment (x_only / y_only / both): user count, total
    interactions, mean interactions per user.

    Scale: one shuffle (the per-user conditional aggregation); the segment
    rollup runs over |users| rows. This is the audit every cross-domain
    dataset build runs before training — an empty 'both' segment means the
    join key is broken, not that the model is bad."""
    r = ratings(spark, sf_dir)
    per_user = r.groupBy("user_id").agg(
        F.max(F.when(F.col("domain") == "x", 1).otherwise(0)).alias("has_x"),
        F.max(F.when(F.col("domain") == "y", 1).otherwise(0)).alias("has_y"),
        F.count(F.lit(1)).alias("n"),
    )
    segment = (
        F.when((F.col("has_x") == 1) & (F.col("has_y") == 1), F.lit("both"))
        .when(F.col("has_x") == 1, F.lit("x_only"))
        .otherwise(F.lit("y_only"))
    )
    return (
        per_user.select(segment.alias("segment"), "n")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_interactions"),
            F.round(F.avg("n"), 6).alias("avg_per_user"),
        )
        .orderBy("segment")
    )


DOMAIN_OVERLAP_ORACLE = f"""
WITH ratings AS ({RATINGS_SQL}),
per_user AS (
    SELECT user_id,
           MAX(CASE WHEN domain = 'x' THEN 1 ELSE 0 END) AS has_x,
           MAX(CASE WHEN domain = 'y' THEN 1 ELSE 0 END) AS has_y,
           COUNT(*) AS n
    FROM ratings GROUP BY user_id
)
SELECT CASE WHEN has_x = 1 AND has_y = 1 THEN 'both'
            WHEN has_x = 1 THEN 'x_only'
            ELSE 'y_only' END AS segment,
       COUNT(*) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_interactions,
       ROUND(AVG(n), 6) AS avg_per_user
FROM per_user
GROUP BY 1 ORDER BY segment
"""


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


def _shuffled_items(r: DataFrame, seed: int = SPLIT_SEED) -> DataFrame:
    """(user_id, domain, items ARRAY<BIGINT>) with items in seeded-shuffle
    order — ONE shuffle (the groupBy), then a purely row-local sort:
    transform to (hash, item) structs, array_sort (lexicographic ⇒ hash asc
    then item asc, identical to the window ORDER BY), project the items
    back out. This replaces a row_number window — same output order, one
    fewer shuffle, and the per-group sort runs inside codegen."""
    grouped = r.groupBy("user_id", "domain").agg(
        F.collect_list("item_id").alias("raw_items")
    )
    keyed = F.transform(
        F.col("raw_items"),
        lambda x: F.struct(
            phash_col(F.col("user_id"), x, seed=seed).alias("h"),
            x.alias("item"),
        ),
    )
    return grouped.select(
        "user_id",
        "domain",
        F.transform(F.array_sort(keyed), lambda s: s["item"]).alias("items"),
    )


def splits_of(r: DataFrame) -> DataFrame:
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

    Plan: one shuffle total (see ``_shuffled_items``); split assembly is a
    row-local array construction + explode. The window spelling this
    replaces (kept in the DuckDB oracle as the semantic definition) needed
    a second exchange for the row_number.
    """
    return splits_from_shuffled(_shuffled_items(r))


def splits_from_shuffled(su: DataFrame) -> DataFrame:
    """`splits_of` body over a precomputed ``_shuffled_items`` frame — the
    reuse point that lets the eval pipeline share ONE grouped/shuffled
    subtree across splits, negatives, and popularity (see
    ``ranking.candidate_scores``)."""
    cnt = F.size(F.col("items"))
    items = F.col("items")
    vali = F.array(F.struct(items[0].alias("item_id"), F.lit("vali").alias("split")))
    test_item = F.when(cnt >= 2, items[1]).otherwise(items[0])
    test = F.array(F.struct(test_item.alias("item_id"), F.lit("test").alias("split")))
    train_items = (
        F.when(cnt == 2, F.slice(items, 2, 1))
        .when(cnt > 2, F.expr("slice(items, 3, size(items) - 2)"))
        .otherwise(F.array().cast("array<bigint>"))
    )
    train = F.transform(
        train_items,
        lambda x: F.struct(x.alias("item_id"), F.lit("train").alias("split")),
    )
    return (
        su.select(
            "user_id",
            "domain",
            F.explode(F.concat(vali, test, train)).alias("s"),
        )
        .select("user_id", F.col("s.item_id").alias("item_id"), "domain", F.col("s.split").alias("split"))
    )


def splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`splits_of` over the sf_dir's events-derived ratings."""
    return splits_of(ratings(spark, sf_dir))


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

    Plan: ONE shuffle (per-user collect_set, reusing the ratings
    partitioning) + a broadcast of the per-domain item universe; the set
    difference, seeded shuffle, and top-99 all happen row-locally with
    higher-order array functions (array_except → hash-keyed array_sort →
    slice). This is the direct distributed spelling of the reference's
    ``set(range(num_item)) − set(items)`` — and strictly cheaper than the
    users×catalog anti-join it replaces (no expanded candidate exchange).

    Scale bound: the universe array must fit in a row (catalog ≤ ~1e6);
    beyond that switch to sample-and-reject (hash-sample ~110 candidate ids
    per user, anti-join the interactions, keep first 99) — same output
    contract. The DuckDB oracle keeps the anti-join spelling as the
    semantic definition.
    """
    return negatives_of(ratings(spark, sf_dir))


def negatives_of(r: DataFrame) -> DataFrame:
    return negatives_from_shuffled(_shuffled_items(r))


def negatives_from_shuffled(
    su: DataFrame, universe: DataFrame | None = None
) -> DataFrame:
    """``negatives_of`` body over a precomputed ``_shuffled_items`` frame.
    ``items`` is duplicate-free (ratings is DISTINCT), so it doubles as the
    per-user seen-set; the domain universe re-aggregates from the same frame
    (map-side combine collapses it to |items| per domain before the tiny
    exchange). ``universe`` overrides that derivation with an explicit
    (domain, universe ARRAY<BIGINT>) frame — required whenever ``su`` is a
    SUBSET of the corpus's users (the incremental eval recomputes only
    affected users, whose negatives must still sample from the GLOBAL
    per-domain catalog)."""
    if universe is None:
        universe = (
            su.select("domain", F.explode("items").alias("item_id"))
            .groupBy("domain")
            .agg(F.collect_set("item_id").alias("universe"))
        )
    per_user = su.select("user_id", "domain", F.col("items").alias("seen"))
    cands = F.array_except(F.col("universe"), F.col("seen"))
    keyed = F.transform(
        cands,
        lambda x: F.struct(
            phash_col(F.col("user_id"), x, seed=SPLIT_SEED).alias("h"),
            x.alias("item"),
        ),
    )
    top99 = F.slice(
        F.transform(F.array_sort(keyed), lambda s: s["item"]), 1, N_NEGATIVES
    )
    return (
        per_user.join(F.broadcast(universe), "domain")
        .select("user_id", "domain", F.posexplode(top99).alias("pos", "item_id"))
        .select(
            "user_id",
            "item_id",
            "domain",
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
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


# -- E3 at catalog scale: sample-and-reject negatives -------------------------

REJECT_OVERSAMPLE = 3  # trials per wanted negative; re-round if underfilled


def negatives_sample_reject(
    r: DataFrame, n: int = N_NEGATIVES, max_rounds: int = 4
) -> DataFrame:
    """The 100 TB spelling of negative sampling (same output contract as
    ``negatives_of``: n deterministic never-interacted items per (user,
    domain) with a dense 1..n rank — different, equally-deterministic item
    choice).

    ``negatives_of`` holds the whole per-domain catalog in one array row —
    fine to ~1e6 items, impossible beyond. Here no row ever sees the
    catalog: each user hashes out ``3n`` trial slots, each slot maps through
    a dense item index (one uniform shuffle), seen items are anti-joined
    away, and the first n survivors (by trial order) win. Skew-free by
    construction — every join/shuffle key (trial index, user) is
    hash-uniform. Heavy users that exhaust their trials re-round with a
    shifted seed (driver loop, geometrically unlikely past round 1 when
    catalog ≫ interactions-per-user).

    FILL GUARANTEE: hash trials alone cannot promise the contract's
    ``min(n, |catalog| − |seen|)`` fill — a user whose unseen remainder
    is a sliver of a huge catalog needs trials to hash-hit those exact
    items. So after the bounded rounds, any still-underfilled (user,
    domain) pairs take one EXACT top-up: their full candidate set via a
    plain anti-join against the items frame (never a catalog array),
    hash-ranked with a fresh seed shift, appended after every trial
    pick. The top-up stage joins |underfilled users| × |domain catalog|
    rows — underfilled users are geometrically rare, so this is the
    exact path's cost confined to a vanishing fraction; when nobody is
    underfilled (the common case, checked with one count on the
    checkpointed picks) the stage is skipped entirely.
    """
    spark = r.sparkSession
    # dense per-domain item index: idx in [0, n_items) — tiny, broadcastable
    items = (
        r.select("domain", "item_id")
        .distinct()
        .withColumn(
            "idx",
            F.row_number()
            .over(Window.partitionBy("domain").orderBy("item_id"))
            .cast("bigint")
            - 1,
        )
    )
    n_items = items.groupBy("domain").agg(F.count(F.lit(1)).alias("n_items"))
    users = r.select("user_id", "domain").distinct().join(
        F.broadcast(n_items), "domain"
    )
    seen = r.select("user_id", "domain", "item_id")

    out: DataFrame | None = None
    have = users.select("user_id", "domain", F.lit(0).alias("n_have"))
    for rnd in range(max_rounds):
        need = have.filter(F.col("n_have") < n)
        if rnd > 0 and need.isEmpty():
            break
        trials = (
            users.join(need.select("user_id", "domain"), ["user_id", "domain"])
            .select(
                "user_id",
                "domain",
                "n_items",
                F.explode(
                    F.sequence(F.lit(0), F.lit(REJECT_OVERSAMPLE * n - 1))
                ).alias("t"),
            )
            .withColumn(
                "idx",
                F.expr(
                    phash_frag("user_id", "t", seed=SPLIT_SEED + 7 * rnd)
                ).cast("bigint")
                % F.col("n_items"),
            )
        )
        cand = (
            trials.join(items, ["domain", "idx"])
            .join(seen, ["user_id", "domain", "item_id"], "left_anti")
            # a trial pair may hash to the same idx twice: keep first trial
            .groupBy("user_id", "domain", "item_id")
            .agg(F.min("t").alias("t"))
        )
        ranked = cand.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id", "domain").orderBy("t", "item_id")
            ),
        ).filter(F.col("rk") <= n)
        picked = ranked.select("user_id", "domain", "item_id", "t")
        out = picked if out is None else (
            # keep earlier rounds' picks; later rounds only top up
            out.unionByName(
                picked.join(
                    out.select("user_id", "domain", "item_id"),
                    ["user_id", "domain", "item_id"],
                    "left_anti",
                ).withColumn("t", F.col("t") + F.lit((rnd + 1) * 10**9))
            )
        )
        # truncate lineage: without this, round k's plan embeds every prior
        # round's full DAG and each `isEmpty`/final action recompiles and
        # recomputes the whole stack (measured 169 s → ~8 s at sf0.01). The
        # checkpointed frame is ≤ n rows per (user, domain) — tiny relative
        # to the trials it replaces; on a cluster this is the standard
        # iterative-algorithm pattern (same reason GraphX/ALS checkpoint).
        out = out.localCheckpoint(eager=True)
        if rnd + 1 < max_rounds:
            # LEFT join from the user frame: a (user, domain) with ZERO
            # picks so far has no row in the out aggregation, and a bare
            # groupBy would silently drop it from every later round's
            # trial set — exactly the users who most need the re-round
            # (their unseen remainder is a sliver, so round 0 likely
            # missed entirely)
            have = (
                users.select("user_id", "domain")
                .join(
                    out.groupBy("user_id", "domain").agg(
                        F.count(F.lit(1)).alias("n_have")
                    ),
                    ["user_id", "domain"],
                    "left",
                )
                .select(
                    "user_id",
                    "domain",
                    F.coalesce("n_have", F.lit(0)).alias("n_have"),
                )
            )
            seen = seen.unionByName(out.select("user_id", "domain", "item_id"))
    assert out is not None
    # exact top-up: contract-complete the rare pairs the hash trials missed
    have = out.groupBy("user_id", "domain").agg(
        F.count(F.lit(1)).alias("n_have")
    )
    under = (
        users.join(have, ["user_id", "domain"], "left")
        .filter(F.coalesce("n_have", F.lit(0)) < n)
        .select("user_id", "domain")
    )
    if not under.isEmpty():
        topup = (
            under.join(items.select("domain", "item_id"), "domain")
            .join(seen, ["user_id", "domain", "item_id"], "left_anti")
            .join(
                out.select("user_id", "domain", "item_id"),
                ["user_id", "domain", "item_id"],
                "left_anti",
            )
            .withColumn(
                "t",
                F.lit((max_rounds + 1) * 10**9)
                + F.row_number().over(
                    Window.partitionBy("user_id", "domain").orderBy(
                        F.expr(
                            phash_frag(
                                "user_id", "item_id",
                                seed=SPLIT_SEED + 7 * max_rounds,
                            )
                        ).asc(),
                        F.col("item_id").asc(),
                    )
                ),
            )
            # n candidates per user always suffice (existing picks only
            # push top-ups out, never in) — trim before the union so a
            # pathological wide-unseen user never ships their whole
            # candidate set through the final ranking
            .filter(F.col("t") <= F.lit((max_rounds + 1) * 10**9 + n))
            .select("user_id", "domain", "item_id", "t")
        )
        out = out.unionByName(topup)
    final = out.withColumn(
        "rank",
        F.row_number()
        .over(Window.partitionBy("user_id", "domain").orderBy("t", "item_id"))
        .cast("int"),
    ).filter(F.col("rank") <= n)
    return final.select("user_id", "item_id", "domain", "rank")


def negatives_sample_reject_oracle(
    ratings_sql: str = RATINGS_SQL,
    n: int = N_NEGATIVES,
    max_rounds: int = 4,
) -> str:
    """Full hash oracle for ``negatives_sample_reject`` — the sampler is
    a deterministic function of the ratings frame (hash trials, seeded
    per round), so DuckDB can replay the EXACT item choice, upgrading
    the query from rows-only to value-hash-checked.

    The unrolling exploits an output-equivalence: Spark only generates
    trials for still-underfilled users (a cost optimization) and breaks
    early when everyone is full, but a full user's later-round picks
    carry strictly larger t-offsets than their first n, so the final
    ``row_number ≤ n`` trims them — generating trials for EVERY user in
    EVERY round yields the identical output set. Likewise the loop's
    union anti-join is redundant given each round anti-joins the
    seen-so-far frame (ratings ∪ picks through the previous round). The
    exact top-up stage replays verbatim: users with < n picks after the
    bounded rounds take their full anti-join candidate set, hash-ranked
    with the seed shifted by 7·max_rounds, offset after every trial
    round. AS MATERIALIZED on every multi-referenced CTE (DuckDB inlines
    single-use CTEs — the k-core 2^rounds lesson)."""
    tpw = REJECT_OVERSAMPLE * n
    rounds_sql = []
    prev_seen = "seen0"
    for rnd in range(max_rounds):
        h = phash_frag("u.user_id", "tr.t", seed=SPLIT_SEED + 7 * rnd)
        rounds_sql.append(f"""
cand{rnd} AS MATERIALIZED (
    SELECT u.user_id, u.domain, i.item_id, MIN(tr.t) AS t
    FROM users u
    JOIN nitems ni ON ni.domain = u.domain
    CROSS JOIN trials tr
    JOIN items i ON i.domain = u.domain
              AND i.idx = ({h}) % ni.n_items
    ANTI JOIN {prev_seen} s ON s.user_id = u.user_id
                           AND s.domain = u.domain
                           AND s.item_id = i.item_id
    GROUP BY 1, 2, 3
),
picks{rnd} AS MATERIALIZED (
    SELECT user_id, domain, item_id, CAST(t AS BIGINT) AS t
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, domain ORDER BY t, item_id
        ) AS rk FROM cand{rnd}
    ) WHERE rk <= {n}
)""")
        # the final round's seen frame has no consumer (the top-up uses
        # seen{max_rounds-1}, mirroring the kernel's skipped last update)
        if rnd + 1 < max_rounds:
            rounds_sql.append(f"""
seen{rnd + 1} AS MATERIALIZED (
    SELECT * FROM {prev_seen}
    UNION ALL
    SELECT user_id, domain, item_id FROM picks{rnd}
)""")
            prev_seen = f"seen{rnd + 1}"
    out_legs = ["SELECT user_id, domain, item_id, t FROM picks0"] + [
        f"SELECT user_id, domain, item_id, t + CAST({(rnd + 1) * 10**9} AS BIGINT)"
        f" AS t FROM picks{rnd}"
        for rnd in range(1, max_rounds)
    ]
    # Spark's post-loop `seen` holds picks through round max_rounds−2
    # only (the loop skips the final update) — the top-up must anti-join
    # that SAME frame plus the full pick set, exactly like the kernel
    topup_seen = f"seen{max_rounds - 1}"
    h_top = phash_frag(
        "un.user_id", "i.item_id", seed=SPLIT_SEED + 7 * max_rounds
    )
    top_off = (max_rounds + 1) * 10**9
    return f"""
WITH r AS MATERIALIZED ({ratings_sql}),
seen0 AS MATERIALIZED (SELECT user_id, domain, item_id FROM r),
items AS MATERIALIZED (
    SELECT domain, item_id,
           ROW_NUMBER() OVER (PARTITION BY domain ORDER BY item_id) - 1 AS idx
    FROM (SELECT DISTINCT domain, item_id FROM r)
),
nitems AS MATERIALIZED (
    SELECT domain, COUNT(*) AS n_items FROM items GROUP BY domain
),
users AS MATERIALIZED (SELECT DISTINCT user_id, domain FROM r),
trials AS MATERIALIZED (SELECT unnest(range(0, {tpw})) AS t),
{','.join(rounds_sql)},
out_all AS MATERIALIZED (
    {' UNION ALL '.join(out_legs)}
),
have AS (
    SELECT user_id, domain, COUNT(*) AS n_have FROM out_all GROUP BY 1, 2
),
under AS MATERIALIZED (
    SELECT u.user_id, u.domain
    FROM users u LEFT JOIN have h
      ON h.user_id = u.user_id AND h.domain = u.domain
    WHERE COALESCE(h.n_have, 0) < {n}
),
topup AS MATERIALIZED (
    SELECT user_id, domain, item_id,
           CAST({top_off} AS BIGINT) + rk AS t
    FROM (
        SELECT un.user_id, un.domain, i.item_id,
               ROW_NUMBER() OVER (
                   PARTITION BY un.user_id, un.domain
                   ORDER BY ({h_top}) ASC, i.item_id ASC
               ) AS rk
        FROM under un
        JOIN items i ON i.domain = un.domain
        ANTI JOIN {topup_seen} s ON s.user_id = un.user_id
                                AND s.domain = un.domain
                                AND s.item_id = i.item_id
        ANTI JOIN out_all o ON o.user_id = un.user_id
                           AND o.domain = un.domain
                           AND o.item_id = i.item_id
    ) WHERE rk <= {n}
)
SELECT user_id, item_id, domain, CAST(rank AS INT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, domain ORDER BY t, item_id
    ) AS rank
    FROM (SELECT * FROM out_all UNION ALL SELECT * FROM topup)
) WHERE rank <= {n}
ORDER BY user_id, domain, rank
"""


_REJECT_CACHE: dict[tuple, DataFrame] = {}


def negatives_sample_reject_cached(
    spark: SparkSession, sf_dir: str, n: int = N_NEGATIVES, max_rounds: int = 4
) -> DataFrame:
    """Per-session memo over ``negatives_sample_reject``: the sampler is
    deterministic for (sf_dir, n, max_rounds), and BOTH its registered
    face and the ``negatives_reject_invariants`` audit need it in the
    same bench/driver run — without the memo each pays the full
    multi-round loop (~6.6 s of a 134 s bench). The cached frame is the
    final ≤ n-per-(user, domain) picks, localCheckpoint'd so reuse costs
    a block read, not a recompute; keyed by applicationId so a new
    session never sees another session's lineage."""
    from ..sources.io import ratings

    app = spark.sparkContext.applicationId
    # entries from stopped sessions hold plans pinned to a dead
    # SparkContext — prune them so a long-lived process (pytest,
    # notebooks) never accumulates unreachable checkpoint references
    for k in [k for k in _REJECT_CACHE if k[0] != app]:
        del _REJECT_CACHE[k]
    key = (app, sf_dir, n, max_rounds)
    got = _REJECT_CACHE.get(key)
    if got is None:
        got = negatives_sample_reject(
            ratings(spark, sf_dir), n, max_rounds
        ).localCheckpoint(eager=False)
        _REJECT_CACHE[key] = got
    return got


# -- E3 scale path, made driver-checkable: invariants companion ---------------

def negatives_reject_invariants(
    r: DataFrame, negs: DataFrame | None = None
) -> DataFrame:
    """Hash-checkable CONTRACT companion for ``negatives_sample_reject``.
    Since round 6 the sampler also carries a FULL hash oracle
    (``negatives_sample_reject_oracle`` replays the exact item choice),
    so this audit is the second, independent line of evidence: it never
    sees the sample mechanics at all — it derives, from the ratings
    frame alone, what ANY contract-satisfying sample must aggregate to
    per (user, domain):

    - ``n_negs``    = min(99, |domain catalog| − |user's seen set|)
      (exact fill — a GUARANTEE, not a hope: the hash-trial rounds top
      up and any still-underfilled pair takes the sampler's exact
      anti-join top-up stage, so the equality holds on every input,
      including a fully-exhausted (user, domain) which contributes an
      n_negs = 0 row on both sides);
    - ``n_overlap``     = 0  (no sampled negative was ever interacted);
    - ``n_out_catalog`` = 0  (every negative is a real domain item);
    - ``n_dup``         = 0  (no item sampled twice for one user);
    - ``rank_dense``    = true (ranks are exactly 1..n_negs).

    The DuckDB side computes the EXPECTED values from the data alone —
    so a hash match certifies every invariant simultaneously. Same scan
    shape as the sampler itself plus three broadcast-sized joins; the
    violation counters are literal zeros only if the anti-join and
    catalog-membership checks actually hold. Pass ``negs`` to audit a
    precomputed (e.g. memo-cached) sample instead of re-running the
    multi-round loop."""
    if negs is None:
        negs = negatives_sample_reject(r)
    catalog = r.select("domain", "item_id").distinct()
    seen = r.select("user_id", "domain", "item_id").distinct()
    checked = (
        negs.join(
            seen.withColumn("is_seen", F.lit(1)),
            ["user_id", "domain", "item_id"],
            "left",
        )
        .join(
            F.broadcast(catalog.withColumn("in_cat", F.lit(1))),
            ["domain", "item_id"],
            "left",
        )
    )
    agg = checked.groupBy("user_id", "domain").agg(
        F.count(F.lit(1)).alias("n_negs"),
        F.sum(F.coalesce("is_seen", F.lit(0))).alias("n_overlap"),
        F.sum(
            F.lit(1) - F.coalesce("in_cat", F.lit(0))
        ).alias("n_out_catalog"),
        (
            F.count(F.lit(1)) - F.countDistinct("item_id")
        ).alias("n_dup"),
        (
            (F.min("rank") == 1)
            & (F.max("rank") == F.count(F.lit(1)))
            & (F.countDistinct("rank") == F.count(F.lit(1)))
        ).alias("rank_dense"),
    )
    # a fully-exhausted (user, domain) legally samples ZERO negatives and
    # so has no rows to aggregate — left-join from the user frame keeps
    # its n_negs = 0 row (the oracle emits one; dropping it was the
    # round-5 asymmetry)
    pairs = r.select("user_id", "domain").distinct()
    return (
        pairs.join(agg, ["user_id", "domain"], "left")
        .select(
            "user_id",
            "domain",
            F.coalesce("n_negs", F.lit(0)).alias("n_negs"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce("n_out_catalog", F.lit(0)).alias("n_out_catalog"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce("rank_dense", F.lit(True)).alias("rank_dense"),
        )
        .orderBy("user_id", "domain")
    )


def negatives_reject_invariants_oracle(ratings_sql: str = RATINGS_SQL) -> str:
    """Expected-value SQL over the same ratings frame: the oracle never
    sees the sample, it derives what ANY contract-satisfying sample must
    aggregate to."""
    return f"""
WITH r AS ({ratings_sql}),
cat AS (SELECT domain, COUNT(DISTINCT item_id) AS n_items FROM r GROUP BY domain),
seen AS (
    SELECT user_id, domain, COUNT(DISTINCT item_id) AS n_seen
    FROM r GROUP BY user_id, domain
)
SELECT s.user_id, s.domain,
       CAST(LEAST({N_NEGATIVES}, c.n_items - s.n_seen) AS BIGINT) AS n_negs,
       CAST(0 AS BIGINT) AS n_overlap,
       CAST(0 AS BIGINT) AS n_out_catalog,
       CAST(0 AS BIGINT) AS n_dup,
       TRUE AS rank_dense
FROM seen s JOIN cat c USING (domain)
ORDER BY s.user_id, s.domain
"""
