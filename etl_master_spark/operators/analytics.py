"""Wider analytics surface — rollups, set ops, date/string/JSON functions,
percentiles, vectorization shapes, seeded samplers.

SURVEY.md §2.8 records these operator classes as ABSENT from the reference;
they are nonetheless part of "an engine a reference user could switch to",
so the engine ships them as first-class, oracle-checked queries:

- grouping sets / ROLLUP (subtotal lattices)
- INTERSECT / EXCEPT set operators
- date part extraction + truncation
- JSON extraction over the events props column
- exact interpolated percentiles
- E6's per-user vector assembly (``main_my.py:81-88`` COO→matrix, kept
  long/array-form — never a dense user×item matrix)
- F3's Gaussian prior sampler (``main_my.py:168``) as a deterministic
  Box–Muller over portable-hash uniforms — the distributed, replayable
  replacement for ``np.random.normal``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import PHASH_P, phash_frag
from ..sources.io import RATINGS_SQL, load_table, shuffle_partitions, ts_s, ts_us


# -- ROLLUP subtotals --------------------------------------------------------

def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region/nation revenue with ROLLUP subtotals + grand total. Spark and
    DuckDB agree on the grouping-set NULL convention; labels are coalesced
    so the output is join-key-safe."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
        .orderBy("region", "nation")
    )


REVENUE_ROLLUP_ORACLE = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY region, nation
"""


# -- INTERSECT / EXCEPT ------------------------------------------------------

def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over user populations: purchasers ∩ clickers,
    purchasers ∖ clickers, symmetric counts. The reference's only set op is
    Python ``set`` subtraction (E3); these are the engine-level spellings."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    both = buyers.intersect(clickers)
    only_buy = buyers.exceptAll(clickers)
    only_click = clickers.exceptAll(buyers)
    return (
        both.withColumn("relation", F.lit("both"))
        .unionByName(only_buy.withColumn("relation", F.lit("purchase_only")))
        .unionByName(only_click.withColumn("relation", F.lit("click_only")))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("relation")
    )


USER_SET_OPS_ORACLE = """
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
tagged AS (
    SELECT user_id, 'both' AS relation FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
    UNION ALL
    SELECT user_id, 'purchase_only' AS relation FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
    UNION ALL
    SELECT user_id, 'click_only' AS relation FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
)
SELECT relation, COUNT(*) AS n_users FROM tagged GROUP BY relation ORDER BY relation
"""


# -- date functions ----------------------------------------------------------

def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + monthly truncation over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            F.dayofweek("o_orderdate").alias("dow"),
            "o_totalprice",
        )
        .groupBy("yr", "mo", "qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("dow").alias("active_weekdays"),
        )
        .orderBy("yr", "mo")
    )


ORDERS_BY_MONTH_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(DISTINCT (EXTRACT(dow FROM o_orderdate) + 1)) AS active_weekdays
FROM orders
GROUP BY 1, 2, 3
ORDER BY yr, mo
"""


# -- JSON functions ----------------------------------------------------------

def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (`{"k": <int>}`) — the engine's
    semi-structured column surface. Buckets the extracted key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )


PROPS_JSON_STATS_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1 ORDER BY k_bucket
"""


HIST_BINS = 20


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (the profiling primitive):
    20 bins between the observed min and max, per-bin count + sum. Bin
    edges come from a 1-row min/max aggregate joined back broadcast; the
    bin index is a narrow per-row expression, so the histogram costs one
    scan + one 20-key aggregate at any data size. (Spark's
    ``histogram_numeric`` sketch is engine-specific; this spelling is
    exact and portable — both engines floor identical doubles.)"""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bin_ = F.least(
        F.lit(HIST_BINS - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS)))
        ),
    ).cast("int")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("bin")
    )


PRICE_HISTOGRAM_ORACLE = f"""
WITH bounds AS (
    SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT CAST(LEAST({HIST_BINS - 1},
            FLOOR((o_totalprice - lo) / ((hi - lo) / {float(HIST_BINS)}))) AS INT)
           AS bin,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders CROSS JOIN bounds
GROUP BY 1 ORDER BY bin
"""


def user_type_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-column surface end to end: per-user event_type→total maps built
    with ``map_from_entries(sort_array(collect_list(struct...)))``, probed
    with ``size``, then ``explode``d back to rows. The map exists BETWEEN
    relational stages, so the DuckDB oracle is plain SQL — the roundtrip
    anchors the map functions to a checkable result. sort_array makes map
    entry order deterministic (collect_list order is not).

    Scale: both aggregations are map-side combined; maps stay bounded at
    |event types| entries per user — never an unbounded collect."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "v")))
        ).alias("m")
    )
    return (
        maps.select(
            "user_id", F.size("m").cast("int").alias("n_types"), F.explode("m")
        )
        .withColumnsRenamed({"key": "event_type", "value": "total_value"})
        .orderBy("user_id", "event_type")
    )


USER_TYPE_VALUE_MAP_ORACLE = """
WITH per AS (
    SELECT user_id, event_type, ROUND(SUM(value), 4) AS v
    FROM events GROUP BY user_id, event_type
),
n AS (SELECT user_id, CAST(COUNT(*) AS INT) AS n_types FROM per GROUP BY user_id)
SELECT p.user_id, n.n_types, p.event_type, p.v AS total_value
FROM per p JOIN n ON p.user_id = n.user_id
ORDER BY p.user_id, p.event_type
"""


# -- percentiles -------------------------------------------------------------

def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``). At 100 TB switch to ``approx_percentile``
    (t-digest sketch, mergeable one-pass) — exact percentile is a full sort
    per group."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


VALUE_PERCENTILES_ORACLE = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


# -- E6: per-user vector assembly (long-form, never dense) -------------------

def user_item_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's answer to the reference's COO→dense-matrix build
    (``main_my.py:81-88``): per (user, domain), the sorted interaction
    vector — as a compact string so both engines hash it identically.
    The dense multi-hot row only ever materializes inside an Arrow batch
    (see model path), never globally."""
    from ..sources.io import ratings

    r = ratings(spark, sf_dir)
    return (
        r.groupBy("user_id", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(F.sort_array(F.collect_list("item_id")), ",").alias(
                "items_csv"
            ),
        )
        .orderBy("user_id", "domain")
    )


USER_ITEM_VECTORS_ORACLE = f"""
WITH ratings AS ({RATINGS_SQL})
SELECT user_id, domain,
       COUNT(*) AS n_items,
       string_agg(CAST(item_id AS VARCHAR), ',' ORDER BY item_id) AS items_csv
FROM ratings
GROUP BY user_id, domain
ORDER BY user_id, domain
"""


# -- F3: deterministic Gaussian prior sampler --------------------------------

PRIOR_N = 4096
PRIOR_SEED = 31


def prior_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference draws GAN priors with ``np.random.normal(0,1,[B,E])``
    (``main_my.py:168``). Distributed + replayable spelling: Box–Muller over
    two portable-hash uniforms per sample —
    z = sqrt(-2 ln u1) · cos(2π u2) — identical on any engine/executor.
    Output: moment check per bucket (mean≈0, std≈1). sf_dir is unused
    (pure generator) but kept for the uniform query signature.

    u2 folds i one round earlier than u1 (extra trailing 0 column) so the
    two streams carry DIFFERENT multipliers of i (A vs A²): two seeds with
    the same fold depth are affine-shifted copies of each other mod P, and
    Box–Muller over perfectly correlated uniforms is visibly biased
    (measured mean 0.31 instead of 0)."""
    ids = spark.range(PRIOR_N).select(F.col("id").cast("bigint").alias("i"))
    u1 = (
        F.expr(phash_frag("i", seed=PRIOR_SEED)).cast("double") + F.lit(1.0)
    ) / F.lit(float(PHASH_P + 1))
    u2 = (
        F.expr(phash_frag("i", "0", seed=PRIOR_SEED)).cast("double") + F.lit(1.0)
    ) / F.lit(float(PHASH_P + 1))
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0) * F.lit(3.141592653589793) * u2)
    return (
        ids.select((F.col("i") % 4).alias("bucket"), z.alias("z"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("z"), 6).alias("mean_z"),
            F.round(F.stddev_pop("z"), 6).alias("std_z"),
        )
        .orderBy("bucket")
    )


PRIOR_SAMPLE_STATS_ORACLE = f"""
WITH ids AS (SELECT unnest(range(0, {PRIOR_N})) AS i),
z AS (
    SELECT i % 4 AS bucket,
           sqrt(-2.0 * ln((CAST({phash_frag('i', seed=PRIOR_SEED)} AS DOUBLE) + 1.0)
                          / {float(PHASH_P + 1)!r}))
           * cos(2.0 * 3.141592653589793
                 * (CAST({phash_frag('i', '0', seed=PRIOR_SEED)} AS DOUBLE) + 1.0)
                 / {float(PHASH_P + 1)!r}) AS z
    FROM ids
)
SELECT bucket, COUNT(*) AS n,
       ROUND(AVG(z), 6) AS mean_z,
       ROUND(stddev_pop(z), 6) AS std_z
FROM z GROUP BY bucket ORDER BY bucket
"""


def prior_family_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 extended to the reference's FULL prior menu (main_my.py:167-175):
    the live Gaussian plus the three commented-out alternatives — laplace
    (inverse-CDF), uniform(0,1), and the reference's "multi-variate
    Gaussian" 0.5·(N(0,1)+N(3,1)) (kind name ``mixture`` here; note the
    reference AVERAGES the two normals — a unimodal N(1.5, √0.5), not a
    bimodal 50/50 mixture density — and we reproduce that arithmetic,
    quirk included). All four derive from the SAME two portable-hash
    uniform streams (``prior_sample_stats``'s u1/u2), so the whole menu
    is engine-replayable; the averaged spelling's second normal is the
    Box–Muller sine component (independent of the cosine). Output:
    moment check per kind — expected (mean, std): gaussian (0,1),
    laplace (0,√2), uniform (.5,√(1/12)), mixture (1.5,√.5). Mirrors
    ``model.gan._prior``'s executor-side kinds."""
    ids = spark.range(PRIOR_N).select(F.col("id").cast("bigint").alias("i"))
    u1 = (
        F.expr(phash_frag("i", seed=PRIOR_SEED)).cast("double") + F.lit(1.0)
    ) / F.lit(float(PHASH_P + 1))
    u2 = (
        F.expr(phash_frag("i", "0", seed=PRIOR_SEED)).cast("double") + F.lit(1.0)
    ) / F.lit(float(PHASH_P + 1))
    two_pi = F.lit(2.0) * F.lit(3.141592653589793)
    z1 = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(two_pi * u2)
    z2 = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.sin(two_pi * u2)
    lap = -F.signum(u1 - 0.5) * F.log(F.lit(1.0) - 2.0 * F.abs(u1 - 0.5))
    mix = F.lit(0.5) * (z1 + (z2 + F.lit(3.0)))
    kinds = F.array(
        F.struct(F.lit("gaussian").alias("kind"), z1.alias("z")),
        F.struct(F.lit("laplace").alias("kind"), lap.alias("z")),
        F.struct(F.lit("mixture").alias("kind"), mix.alias("z")),
        F.struct(F.lit("uniform").alias("kind"), u1.alias("z")),
    )
    return (
        ids.select(F.explode(kinds).alias("s"))
        .select(F.col("s.kind").alias("kind"), F.col("s.z").alias("z"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("z"), 6).alias("mean_z"),
            F.round(F.stddev_pop("z"), 6).alias("std_z"),
        )
        .orderBy("kind")
    )


def _prior_u(extra: str | None = None) -> str:
    """The portable-hash uniform stream as a SQL fragment (u1 without
    ``extra``, u2 with the trailing '0' fold — see prior_sample_stats)."""
    frag = (
        phash_frag("i", extra, seed=PRIOR_SEED)
        if extra is not None
        else phash_frag("i", seed=PRIOR_SEED)
    )
    return f"((CAST({frag} AS DOUBLE) + 1.0) / {float(PHASH_P + 1)!r})"


PRIOR_FAMILY_STATS_ORACLE = f"""
WITH ids AS (SELECT unnest(range(0, {PRIOR_N})) AS i),
u AS (
    SELECT i,
           {_prior_u()} AS u1,
           {_prior_u('0')} AS u2
    FROM ids
),
z AS (
    SELECT i, u1, u2,
           sqrt(-2.0 * ln(u1)) * cos(2.0 * 3.141592653589793 * u2) AS z1,
           sqrt(-2.0 * ln(u1)) * sin(2.0 * 3.141592653589793 * u2) AS z2
    FROM u
),
fam AS (
    SELECT 'gaussian' AS kind, z1 AS z FROM z
    UNION ALL
    SELECT 'laplace', -sign(u1 - 0.5) * ln(1.0 - 2.0 * abs(u1 - 0.5)) FROM z
    UNION ALL
    SELECT 'mixture', 0.5 * (z1 + (z2 + 3.0)) FROM z
    UNION ALL
    SELECT 'uniform', u1 FROM z
)
SELECT kind, COUNT(*) AS n,
       ROUND(AVG(z), 6) AS mean_z,
       ROUND(stddev_pop(z), 6) AS std_z
FROM fam GROUP BY kind ORDER BY kind
"""


# -- moving-average window frames --------------------------------------------

def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series frame windows over the hourly event rollup: 3-hour
    trailing moving average, previous-hour delta (lag), next-hour peek
    (lead), cumulative volume. One partition-by-type window chain — a
    single shuffle keyed by event_type, every frame computed in the same
    sort pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    return (
        hourly.select(
            ts_s("hour").alias("hour_start"),
            "event_type",
            "n",
            F.round(F.avg("n").over(w.rowsBetween(-2, 0)), 6).alias("ma3"),
            (F.col("n") - F.lag("n", 1).over(w)).alias("delta_prev"),
            F.lead("n", 1).over(w).alias("next_n"),
            F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_n"),
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_MOVING_AVG_ORACLE = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT CAST(epoch(hour) AS BIGINT) AS hour_start,
       event_type,
       n,
       ROUND(AVG(n) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3,
       n - LAG(n, 1) OVER (PARTITION BY event_type ORDER BY hour) AS delta_prev,
       LEAD(n, 1) OVER (PARTITION BY event_type ORDER BY hour) AS next_n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
FROM hourly
ORDER BY hour_start, event_type
"""


# -- CUBE (full grouping-set lattice) ----------------------------------------

def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (order year, customer market segment): all four grouping
    sets in one pass — Spark expands the lattice before the single hash
    aggregate, so it costs one shuffle, not four queries."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(F.year("o_orderdate").alias("yr"), "c_mktsegment", "o_totalprice")
        .cube("yr", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_orders",
            "revenue",
        )
        .orderBy("yr", "segment")
    )


ORDERS_CUBE_ORACLE = """
SELECT COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS yr,
       COALESCE(c_mktsegment, 'ALL') AS segment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (EXTRACT(year FROM o_orderdate), c_mktsegment)
ORDER BY yr, segment
"""


def priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status, priority), (status), ()) — the
    asymmetric lattice rollup/cube can't express (no per-priority margin).
    Like those, Spark expands the sets before ONE hash aggregate: one
    shuffle for all three levels. ``grouping_id`` disambiguates aggregated
    columns from genuine NULLs (both engines share the bitmask convention:
    leftmost grouping column = most significant bit)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


PRIORITY_GROUPING_SETS_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY status, priority
"""


# -- string function library --------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's string surface in one query over part names: case
    mapping, substring, concat, trim/pad, replace, split, position,
    reverse — all JVM builtins with exact DuckDB twins."""
    part = load_table(spark, sf_dir, "part")
    first_word = F.element_at(F.split(F.col("p_name"), " "), 1)
    return (
        part.select(
            "p_partkey",
            F.upper(first_word).alias("upper_first"),
            F.lower(F.substring("p_name", 1, 5)).alias("lower_prefix"),
            F.concat_ws("-", F.lit("p"), F.col("p_partkey").cast("string")).alias("tag"),
            F.length(F.trim(F.col("p_name"))).alias("trimmed_len"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.regexp_replace("p_name", " ", "_").alias("snake_name"),
            F.size(F.split(F.col("p_name"), " ")).alias("n_words"),
            F.instr("p_name", "a").alias("first_a"),
            F.reverse(first_word).alias("rev_first"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCTIONS_ORACLE = """
SELECT p_partkey,
       UPPER(string_split(p_name, ' ')[1]) AS upper_first,
       LOWER(SUBSTRING(p_name, 1, 5)) AS lower_prefix,
       CONCAT_WS('-', 'p', CAST(p_partkey AS VARCHAR)) AS tag,
       LENGTH(TRIM(p_name)) AS trimmed_len,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       REPLACE(p_name, ' ', '_') AS snake_name,
       len(string_split(p_name, ' ')) AS n_words,
       CASE WHEN POSITION('a' IN p_name) IS NULL THEN 0
            ELSE POSITION('a' IN p_name) END AS first_a,
       REVERSE(string_split(p_name, ' ')[1]) AS rev_first
FROM part
ORDER BY p_partkey
"""


# -- correlation / covariance -------------------------------------------------

def price_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of lineitem quantity vs
    extended price per return flag — the two-moment aggregates every
    profiler needs. Single map-side-combinable pass (corr/covar are
    algebraic aggregates: sums of x, y, xy, x², y²)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        )
        .orderBy("l_returnflag")
    )


PRICE_CORRELATIONS_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       ROUND(stddev_samp(l_extendedprice), 4) AS std_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -- sketch-based approximations (the registered 100 TB switchovers) ----------

APPROX_RSD = 0.02  # HLL relative standard deviation for the sketch twins
APPROX_PCTS = [0.5, 0.9, 0.99]


def approx_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path twins of `cardinalities` and `value_percentiles` in
    one pass: HLL distinct sketches + t-digest percentiles per event type —
    REGISTERED FACE in long scalar form (event_type, pct, approx_value,
    approx_users, approx_events): the percentile array posexplodes because
    array-typed output columns crash every pandas value-hash comparator
    (the driver's rows-only canonicalizer included). Sketch values differ
    engine-to-engine by design, so this stays a rows-only query; the
    tolerance contract is hash-certified by ``approx_profiles_audit``
    and additionally pinned in tests/test_approx.py.

    posexplode_OUTER, not posexplode: a group whose ``value`` is entirely
    NULL has a NULL percentile array, and the inner explode would drop
    that event type's row entirely — losing its HLL distinct counts,
    which are well-defined regardless of ``value``. The outer explode
    keeps the group with NULL pct/approx_value alongside its sketches."""
    pcts = ", ".join(str(p) for p in APPROX_PCTS)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=APPROX_RSD).alias(
                "approx_users"
            ),
            F.approx_count_distinct("event_id", rsd=APPROX_RSD).alias(
                "approx_events"
            ),
            F.expr(f"approx_percentile(value, array({pcts}))").alias("pv"),
        )
        .select(
            "event_type",
            "approx_users",
            "approx_events",
            F.posexplode_outer("pv").alias("pos", "approx_value"),
        )
        .select(
            "event_type",
            # F.get, NOT element_at: with the NULL pos an outer explode
            # emits, Spark 4.1.2's element_at ignores the index's null
            # flag and reads the garbage value slot (measured: returns
            # the LAST element after a generate, 0 after a VALUES scan).
            # get() is 0-based and genuinely null-safe; pinned in
            # tests/test_approx.py::test_element_at_null_index_quirk.
            F.get(
                F.array(*[F.lit(p) for p in APPROX_PCTS]), F.col("pos")
            ).alias("pct"),
            "approx_value",
            "approx_users",
            "approx_events",
        )
        .orderBy("event_type", "pct")
    )


APPROX_HLL_SIGMAS = 5  # |approx − exact| ceiling in units of rsd·exact
APPROX_RANK_EPS = 0.05  # rank-tolerance half-width for sketch percentiles


def approx_profiles_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable invariants companion for ``approx_profiles`` (the
    ``negatives_reject_invariants`` pattern): sketch VALUES are
    engine-specific, but the sketch CONTRACT is not — HLL at rsd=0.02
    must land within ``APPROX_HLL_SIGMAS``·rsd of the exact distinct
    count, and an approximate percentile at p must be a value whose
    true rank is within ``APPROX_RANK_EPS`` of p (strictly-less fraction
    ≤ p+ε AND at-most fraction ≥ p−ε — the two-sided spelling that is
    tie-safe). This query measures the ACTUAL sketches against the exact
    aggregates computed in the same grouped pass and emits per-type
    booleans plus the data-derived group size; the oracle derives the
    expected rows from the events table alone.

    Plan: the sketches and the exact distinct counts aggregate in TWO
    separate grouped passes joined on the |event_type|-sized key —
    mixing two DISTINCT aggregates with sketch buffers in one agg
    triggers Catalyst's Expand rewrite (every row ×3, sketch buffers
    dragged through with nulls; measured 9.1 s vs 1.4 + 1.3 s split at
    sf0.1) — then one broadcast of the ≤ |event_type|×|pcts| threshold
    frame back onto the events scan for the rank counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id", "value"
    )
    pcts = ", ".join(str(p) for p in APPROX_PCTS)
    prof = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=APPROX_RSD).alias("au"),
        F.approx_count_distinct("event_id", rsd=APPROX_RSD).alias("ae"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr(f"approx_percentile(value, array({pcts}))").alias("pv"),
    # |event_type| rows; checkpointed because BOTH the count booleans and
    # the percentile thresholds read it — without this the grouped
    # aggregation subtree (a full corpus scan) executes twice
    ).localCheckpoint(eager=False)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("xu"),
        F.countDistinct("event_id").alias("xe"),
    )
    tol = F.lit(APPROX_HLL_SIGMAS * APPROX_RSD)
    counts = prof.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_events",
        (F.abs(F.col("au") - F.col("xu")) <= tol * F.col("xu")).alias("users_ok"),
        (F.abs(F.col("ae") - F.col("xe")) <= tol * F.col("xe")).alias("events_ok"),
    )
    thresholds = prof.select(
        "event_type",
        F.posexplode("pv").alias("pos", "v"),
    ).select(
        "event_type",
        F.element_at(
            F.array(*[F.lit(p) for p in APPROX_PCTS]), F.col("pos") + 1
        ).alias("p"),
        "v",
    )
    # approx_percentile ignores NULL values, so the rank denominator
    # must too — and an all-NULL type yields pv=NULL (no threshold rows),
    # handled by the vacuous-TRUE coalesce on the final left join
    ranks = (
        ev.select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .join(F.broadcast(thresholds), "event_type")
        .groupBy("event_type", "p")
        .agg(
            (
                (
                    F.sum((F.col("value") < F.col("v")).cast("long"))
                    / F.count(F.lit(1))
                    <= F.col("p") + F.lit(APPROX_RANK_EPS)
                )
                & (
                    F.sum((F.col("value") <= F.col("v")).cast("long"))
                    / F.count(F.lit(1))
                    >= F.col("p") - F.lit(APPROX_RANK_EPS)
                )
            ).alias("rank_ok")
        )
    )
    pct_ok = ranks.groupBy("event_type").agg(
        *[
            F.max(
                F.when(F.col("p") == F.lit(p), F.col("rank_ok"))
            ).alias(f"p{int(p * 100)}_ok")
            for p in APPROX_PCTS
        ]
    )
    return (
        counts.join(pct_ok, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            "users_ok",
            "events_ok",
            *[
                F.coalesce(f"p{int(p * 100)}_ok", F.lit(True)).alias(
                    f"p{int(p * 100)}_ok"
                )
                for p in APPROX_PCTS
            ],
        )
        .orderBy("event_type")
    )


def approx_profiles_audit_oracle() -> str:
    """Expected contract rows derived from the events table alone — the
    oracle never sees the sketches; n_events ties the hash to the data,
    the booleans to the sketch error bounds."""
    cols = ", ".join(
        f"TRUE AS p{int(p * 100)}_ok" for p in APPROX_PCTS
    )
    return f"""
SELECT event_type, COUNT(*) AS n_events,
       TRUE AS users_ok, TRUE AS events_ok, {cols}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# -- sequential conversion funnel --------------------------------------------

FUNNEL_WINDOW_US = 12 * 3600 * 1_000_000  # 12h per-stage conversion window


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel with a 12-hour per-stage window:
    a click counts only if it follows the user's first view within 12h,
    a purchase only if it follows that qualifying click within 12h.

    The sequential dependency (stage N's deadline comes from stage N−1's
    result) is two min-aggregate→join rounds, all keyed on user_id — the
    natural parallel key — with timestamps held as INTEGER microseconds so
    both engines compare identically. The four stage counts are 1-row
    aggregates cross-joined back together (broadcast, free), the same
    scalar-subquery decorrelation used by small_quantity_part_revenue.
    Scale: each join is user_id↔user_id (co-partitioned by the shuffle),
    stage frames only shrink, and nothing ever leaves the executors until
    the final 1-row assembly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", ts_us("ts").alias("us"), "event_type"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("us") > F.col("t_view"))
            & (F.col("us") <= F.col("t_view") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("us") > F.col("t_click"))
            & (F.col("us") <= F.col("t_click") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    total = ev.agg(F.countDistinct("user_id").alias("users_total"))
    n_view = views.agg(F.count(F.lit(1)).alias("viewed"))
    n_click = clicks.agg(F.count(F.lit(1)).alias("clicked"))
    n_buy = purchases.agg(F.count(F.lit(1)).alias("purchased"))
    return (
        total.crossJoin(n_view)
        .crossJoin(n_click)
        .crossJoin(n_buy)
        .select(
            "users_total",
            "viewed",
            "clicked",
            "purchased",
            F.round(F.col("viewed") / F.col("users_total"), 6).alias("view_rate"),
            F.when(
                F.col("viewed") > 0, F.round(F.col("clicked") / F.col("viewed"), 6)
            ).alias("click_through"),
            F.when(
                F.col("clicked") > 0, F.round(F.col("purchased") / F.col("clicked"), 6)
            ).alias("purchase_through"),
        )
    )


CONVERSION_FUNNEL_ORACLE = f"""
WITH v AS (
    SELECT user_id, MIN(epoch_us(ts)) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND epoch_us(e.ts) > v.t_view
      AND epoch_us(e.ts) <= v.t_view + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) > c.t_click
      AND epoch_us(e.ts) <= c.t_click + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
), counts AS (
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS users_total,
           (SELECT COUNT(*) FROM v) AS viewed,
           (SELECT COUNT(*) FROM c) AS clicked,
           (SELECT COUNT(*) FROM p) AS purchased
)
SELECT users_total, viewed, clicked, purchased,
       ROUND(viewed / users_total, 6) AS view_rate,
       CASE WHEN viewed > 0 THEN ROUND(clicked / viewed, 6) END AS click_through,
       CASE WHEN clicked > 0 THEN ROUND(purchased / clicked, 6) END AS purchase_through
FROM counts
"""


# -- weekly retention cohorts ------------------------------------------------

def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-active
    week, retention = share of the cohort active N weeks later.

    One pass derives (user, activity_week); a min-agg pins each user's
    cohort; the join back is user_id↔user_id; the final group-by has
    |weeks|² keys — fixed by the calendar, not data volume. Cohort size
    is recovered from the offset-0 row via a window (every user is active
    in their own first week by construction, so offset 0 always exists)
    instead of a second self-join. Week truncation is Monday-based in
    both engines; offsets stay exact integers because both sides of the
    datediff are week-aligned."""
    wk = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk"))
        .distinct()
    )
    first = wk.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    active = (
        wk.join(first, "user_id")
        .groupBy(
            F.col("cohort").cast("string").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return active.select(
        "cohort_week",
        "week_offset",
        "active_users",
        F.first("active_users").over(w).alias("cohort_size"),
        F.round(F.col("active_users") / F.first("active_users").over(w), 6).alias(
            "retention"
        ),
    )


WEEKLY_RETENTION_ORACLE = """
WITH wk AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
), first AS (
    SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id
), active AS (
    SELECT CAST(cohort AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT wk.user_id) AS active_users
    FROM wk JOIN first ON wk.user_id = first.user_id
    GROUP BY 1, 2
)
SELECT cohort_week, week_offset, active_users,
       FIRST_VALUE(active_users) OVER w AS cohort_size,
       ROUND(active_users / FIRST_VALUE(active_users) OVER w, 6) AS retention
FROM active
WINDOW w AS (PARTITION BY cohort_week ORDER BY week_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# -- trailing-hour RANGE frame -----------------------------------------------

TRAIL_US = 3600 * 1_000_000  # one hour, integer microseconds


def events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour activity via a RANGE window frame — the
    frame boundary is a VALUE offset (ts − 1h), not a row count, so burst
    density is measured exactly regardless of event spacing; contrast
    events_moving_avg's ROWS frame.

    Ordering key is integer microseconds (float seconds would make the
    frame edge engine-dependent). Partitioned by user_id: frames never
    cross users, so the sort is per-partition and parallelism survives
    scale-up; no global sort exists in the plan."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us("ts"))
        .rangeBetween(-TRAIL_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_trailing_hour"),
    )


EVENTS_TRAILING_HOUR_ORACLE = f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_hour,
       ROUND(SUM(value) OVER w, 2) AS value_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW)
"""


# -- table profiling / data-quality audit ------------------------------------

PROFILE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-profiling audit of lineitem's numeric columns — row count,
    null count, exact distinct cardinality, min/max/mean per column. The
    pre-flight check every ingest pipeline runs before trusting a table.

    ONE aggregation branch PER COLUMN, unioned long-form — not one agg
    with every COUNT(DISTINCT) (Catalyst's Expand rewrite multiplies the
    agg input ×(|distinct-cols|+1); measured 4.5 s vs 0.8 s at sf0.1).
    The per-column spelling reads NO extra bytes on columnar storage:
    each branch's parquet scan prunes to its single column, so the six
    branches together read exactly what the one wide scan read, and each
    branch plans its lone distinct without Expand. The same lesson as
    the approx_profiles distinct-split (round 6), taken to its
    conclusion. At 100 TB swap COUNT DISTINCT for approx_count_distinct
    (the approx_profiles query is that twin). Mean rounds at 4dp (values
    here are ≤1e6, so the comparison grid stays far above double
    noise)."""
    from functools import reduce

    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(F.col(c).cast("double")).alias("min_val"),
            F.max(F.col(c).cast("double")).alias("max_val"),
            F.round(F.avg(F.col(c).cast("double")), 4).alias("mean_val"),
        )
        for c in PROFILE_COLS
    ]
    return reduce(lambda x, y: x.unionByName(y), parts).orderBy("col_name")


TABLE_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS DOUBLE)) AS min_val,
       MAX(CAST({c} AS DOUBLE)) AS max_val,
       ROUND(AVG(CAST({c} AS DOUBLE)), 4) AS mean_val
FROM lineitem
""".strip()
    for c in PROFILE_COLS
)


# -- time-hierarchy rollup (hypertable-style continuous aggregate) ------------

def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: event counts/value sums at
    (day, hour-of-day) grain with ROLLUP subtotals — per-day rows, plus
    the all-time grand total. The batch spelling of a continuous
    aggregate hierarchy: the finest grain is what a streaming hourly
    rollup materializes; coarser grains fold out of it.

    One scan; the grouping lattice multiplies agg input ×3 but the key
    space is calendar-sized. Sentinel −1 marks subtotal levels (both
    engines agree on the grouping-set NULL, coalesced identically)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.hour("ts").alias("hour_of_day"),
            "value",
        )
        .rollup("day", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            F.coalesce("hour_of_day", F.lit(-1)).alias("hour_of_day"),
            "n_events",
            "sum_value",
        )
        .orderBy("day", "hour_of_day")
    )


EVENTS_TIME_ROLLUP_ORACLE = """
SELECT COALESCE(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), 'ALL') AS day,
       COALESCE(EXTRACT(hour FROM ts), -1) AS hour_of_day,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE), EXTRACT(hour FROM ts))
ORDER BY day, hour_of_day
"""


# -- ratio-to-report window (market share) ------------------------------------

def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share query (TPC-H Q8's ratio shape): each supplier
    nation's share of every part brand's revenue, via a windowed
    ratio-to-report — SUM OVER (PARTITION BY brand) — on top of a
    grouped aggregate.

    The agg collapses lineitem to |brands|×|nations| rows FIRST, so the
    window sees dimension-sized input; revenue sums ride BIGINT 1e-4
    units end-to-end and the share divides the two exact integers, so
    both engines divide identical values."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    revenue_e4 = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000, 0
    ).cast("long")
    w = Window.partitionBy("p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", F.col("n_name").alias("supp_nation"))
        .agg(F.sum(revenue_e4).alias("rev_e4"))
        .select(
            "p_brand",
            "supp_nation",
            (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
            F.round(F.col("rev_e4") / F.sum("rev_e4").over(w), 6).alias("brand_share"),
        )
        .orderBy("p_brand", "supp_nation")
    )


BRAND_REVENUE_SHARE_ORACLE = """
WITH agg AS (
    SELECT p_brand, n_name AS supp_nation,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS rev_e4
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT p_brand, supp_nation,
       ((rev_e4 + 50) // 100) / 100.0 AS revenue,
       ROUND(rev_e4 / SUM(rev_e4) OVER (PARTITION BY p_brand), 6) AS brand_share
FROM agg
ORDER BY p_brand, supp_nation
"""


# -- anomaly detection: hourly z-scores ---------------------------------------

def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: each (event_type, hour) bucket scored as
    a z-score against that type's own hourly distribution, flagged at
    |z| > 2 — the monitoring query a pipeline runs over its own event
    stream.

    Two-level reduce: hourly rollup (calendar-sized key space), then a
    per-type mean/stddev over the rollup (|types| rows) broadcast back
    onto it. Nothing touches raw-event cardinality twice, and the join is
    dimension-sized at any corpus scale. stddev is the sample estimator in
    both engines; z rounds at 4dp (counts are ≤1e4 here, grid far above
    double noise)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            ts_s(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    dist = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("n_events").alias("mean_n"), F.stddev_samp("n_events").alias("std_n")
    )
    z = (F.col("n_events") - F.col("mean_n")) / F.col("std_n")
    return (
        hourly.join(F.broadcast(dist), hourly.event_type == dist.et)
        .select(
            "hour_start",
            "event_type",
            "n_events",
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_HOURLY_ANOMALIES_ORACLE = """
WITH hourly AS (
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
), dist AS (
    SELECT event_type AS et, AVG(n_events) AS mean_n, stddev_samp(n_events) AS std_n
    FROM hourly GROUP BY 1
)
SELECT hour_start, hourly.event_type, n_events,
       ROUND((n_events - mean_n) / std_n, 4) AS zscore,
       ABS((n_events - mean_n) / std_n) > 2.0 AS is_anomaly
FROM hourly JOIN dist ON hourly.event_type = dist.et
ORDER BY hour_start, event_type
"""


# -- shipping delay distribution ----------------------------------------------

def shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: exact
    interpolated delay percentiles (p50/p90/p99) + mean over the
    lineitem⋈orders join, delays in whole days (datediff — integer, so
    percentile interpolation is over exact values in both engines).

    The join shuffles on orderkey; the percentile agg is the expensive
    part (per-group sort) — at 100 TB swap ``approx_percentile`` exactly
    as value_percentiles documents."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", delay.alias("delay_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("delay_days"), 4).alias("mean_delay"),
            F.round(F.expr("percentile(delay_days, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(delay_days, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(delay_days, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


SHIPPING_DELAY_STATS_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       ROUND(AVG(delay_days), 4) AS mean_delay,
       ROUND(quantile_cont(delay_days, 0.5), 4) AS p50,
       ROUND(quantile_cont(delay_days, 0.9), 4) AS p90,
       ROUND(quantile_cont(delay_days, 0.99), 4) AS p99
FROM (
    SELECT o_orderpriority,
           date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- iterative graph analytics: PageRank on the trade graph -------------------

PR_ITERS = 5
PR_DAMP = 0.85
PR_TOL = 0.000001  # converged ⇔ max per-node last-round movement ≤ this


def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the weighted nation-to-nation trade graph (edges =
    supplier-nation → customer-nation line revenue, the nation_pair_trade
    matrix without the year split). The second iterative operator family
    next to dedup_clusters' connected components: rank mass flows along
    out-edge weight shares for ``PR_ITERS`` damped rounds.

    Scale shape: the ONLY fact-scale stage is the edge aggregation (one
    shuffle, map-side combined); the graph itself is dimension-sized
    (≤25² edges), so every iteration is a broadcast-sized join-agg —
    at 100 TB the iterations cost nothing and the edge build is one
    pricing_summary-class pass. Revenue weights ride BIGINT 1e-4 units;
    dangling nations (no out-edges) are impossible here by construction
    (every nation ships somewhere at these scales), asserted by the
    left-join null-fill being exercised in tests at sf0.001.

    The unrolled-CTE oracle replays the identical trajectory, like
    kmeans_embeddings.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    revenue_e4 = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000, 0
    ).cast("long")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("src")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(revenue_e4).alias("w"))
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge share of its source's out-weight: the transition matrix row.
    # MATERIALIZED (r10 optimization): the unrolled power iteration
    # references ``trans`` once per round and the delta join duplicates
    # the whole previous-round subtree, so the lazy spelling re-ran the
    # fact-scale edge aggregation (lineitem ⋈ orders ⋈ customer ⋈ …)
    # NINE times per execution — plans/r10/nation_pagerank_before.txt
    # shows 119 parquet scans. The frame is ≤ 25·24 rows (guide §5:
    # materialize reused intermediates; §2.4: remove repeated passes) —
    # one localCheckpoint makes every iteration a broadcast-sized join
    # over 600 rows. Values are the identical doubles, so the trajectory
    # and the oracle hash are unchanged.
    trans = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    ).localCheckpoint()
    nodes = nation.select(F.col("n_name").alias("node")).localCheckpoint()
    n_nodes = nodes.count()  # 25 — dimension-sized by schema
    return pagerank_ranks(nodes, trans, n_nodes, PR_ITERS, PR_DAMP, PR_TOL)


def pagerank_ranks(
    nodes: DataFrame,
    trans: DataFrame,
    n_nodes: int,
    iters: int,
    damp: float,
    tol: float,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Damped power iteration over a (src, dst, p) transition frame for a
    FIXED ``iters`` rounds, with the truncation made observable: each node
    reports ``delta`` (its last-round rank movement, rounded like the rank
    itself) plus the global ``rounds_used`` / ``converged`` self-report
    (converged ⇔ max last-round movement ≤ ``tol``). A bounded-round
    kernel that silently reports its approximation as the answer is the
    failure mode this column removes — at 100× the graph, the caller SEES
    whether ``iters`` sufficed instead of trusting a gate-scale test.
    ``checkpoint_every`` > 0 truncates lineage for long test runs; the
    registered 5-round query never needs it."""
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev = ranks
    for it in range(iters):
        prev = ranks
        inflow = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.node == inflow.dst, "left").select(
            "node",
            (
                F.lit((1.0 - damp) / n_nodes)
                + F.lit(damp) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    joined = ranks.join(
        prev.select(F.col("node").alias("pn"), F.col("rank").alias("prev_rank")),
        ranks.node == F.col("pn"),
    ).select(
        "node",
        F.round("rank", 8).alias("rank"),
        F.round(F.abs(F.col("rank") - F.col("prev_rank")), 8).alias("delta"),
    )
    w_all = Window.partitionBy()  # graph is node-sized here; 1-partition OK
    return joined.select(
        "node",
        "rank",
        "delta",
        F.lit(iters).cast("int").alias("rounds_used"),
        (F.max("delta").over(w_all) <= F.lit(tol)).alias("converged"),
    ).orderBy("node")


def nation_pagerank_oracle() -> str:
    base = """
edges AS MATERIALIZED (
    SELECT sn.n_name AS src, cn.n_name AS dst,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS w
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2
),
trans AS MATERIALIZED (
    SELECT src, dst, w * 1.0 / SUM(w) OVER (PARTITION BY src) AS p FROM edges
),
nodes AS (SELECT n_name AS node FROM nation),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)
""".strip()
    parts = [base]
    for t in range(PR_ITERS):
        parts.append(
            f"""
r{t + 1} AS MATERIALIZED (
    SELECT nodes.node,
           (1.0 - {PR_DAMP}) / nn.n
             + {PR_DAMP} * COALESCE(i.inflow, 0.0) AS rank
    FROM nodes CROSS JOIN nn
    LEFT JOIN (
        SELECT trans.dst, SUM(trans.p * r{t}.rank) AS inflow
        FROM trans JOIN r{t} ON trans.src = r{t}.node
        GROUP BY trans.dst
    ) i ON nodes.node = i.dst
)""".strip()
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cur.node, ROUND(cur.rank, 8) AS rank,
       ROUND(ABS(cur.rank - prev.rank), 8) AS delta,
       CAST({PR_ITERS} AS INTEGER) AS rounds_used,
       MAX(ROUND(ABS(cur.rank - prev.rank), 8)) OVER () <= {PR_TOL!r}
           AS converged
FROM r{PR_ITERS} cur JOIN r{PR_ITERS - 1} prev ON cur.node = prev.node
ORDER BY cur.node
"""
    )


# -- sequence analytics: event-type transition matrix -------------------------

def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | type) with counts — the sequence-mining primitive under
    next-action prediction and session modeling.

    One window pass (lag over the per-user timeline — same
    (user_id, ts, event_id) spec as event_gaps, so ordering is
    deterministic under concurrent events), then a |types|²-key aggregate
    and a ratio-to-report window over it. Only the lag stage sees event
    cardinality; the probability normalization runs on ≤25 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    wp = Window.partitionBy("prev_type")
    return (
        pairs.groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITIONS_ORACLE = """
WITH pairs AS (
    SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_type,
           event_type AS next_type
    FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


# -- market-basket co-occurrence ----------------------------------------------

CO_PURCHASE_MIN_COUNT = 3


def _baskets(li: DataFrame) -> DataFrame:
    """Per-order DISTINCT part set (collect_set is its own dedup),
    array_sorted for the canonical a<b pair orientation."""
    return li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )


def _pairs_of(baskets: DataFrame) -> DataFrame:
    """(part_a < part_b, n) co-occurrence counts from a basket frame: the
    k(k-1)/2 pairs built ROW-LOCALLY with array higher-order functions
    (slice from i+2 — 1-based — pairs each part with its strict
    successors only). The ONE pair-build shared by co_purchase_pairs,
    triangle_count, association_rules, and copurchase_communities, so
    the subtle slice offset lives in exactly one place."""
    # two Generate(explode) steps + a plain slice (r10 optimization,
    # guide §4.1): the former nested transform/flatten lambda spelling
    # evaluated INTERPRETED per row (higher-order functions never enter
    # whole-stage codegen) and allocated a struct per pair; posexplode +
    # slice emit the identical (a, b) stream through codegen'd
    # generators. Same rows, same aggregate — oracle-equal by hash.
    return (
        baskets.select(
            F.posexplode(F.col("parts")).alias("i", "a"),
            F.col("parts"),
        )
        .select(
            F.col("a"),
            F.explode(
                F.slice(F.col("parts"), F.col("i") + 2, F.size("parts"))
            ).alias("b"),
        )
        .groupBy(F.col("a").alias("part_a"), F.col("b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _basket_pairs(li: DataFrame) -> DataFrame:
    return _pairs_of(_baskets(li))


def co_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in the same order (market-basket / item
    co-occurrence — the edge-build for an item-similarity graph, the third
    graph-family operator beside connected components and PageRank).

    The self-join explodes each order into its line pairs: with the
    (orderkey, partkey) DISTINCT collapse first, an order with k parts
    yields k(k-1)/2 pairs — bounded by order size (~4 lines avg here), not
    data volume, so the join output stays ~3× the fact. The `<` on partkey
    halves the pairs and canonicalizes orientation. At 100 TB the one risk
    is a pathological mega-basket (k in the thousands): cap baskets first
    with a windowed row_number ≤ K over the order — the standard guard in
    co-occurrence mining (dropping a 5000-line basket's tail loses less
    signal than its 12M pairs cost). Final agg is map-side-combined on the
    pair key; the min-count filter drops the long tail before the sort."""
    li = load_table(spark, sf_dir, "lineitem")
    # one scan + two shuffles: the shared _baskets/_pairs_of build (the
    # self-join spelling scanned and shuffled the basket table twice —
    # Spark doesn't share the common subplan — measured 6.4 s → ~1.5 s
    # at sf0.1), then the support filter and top-100.
    return (
        _basket_pairs(li)
        .select("part_a", "part_b", F.col("n").alias("n_orders"))
        .filter(F.col("n_orders") >= CO_PURCHASE_MIN_COUNT)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(100)
    )


CO_PURCHASE_PAIRS_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM baskets a
JOIN baskets b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= {CO_PURCHASE_MIN_COUNT}
ORDER BY n_orders DESC, part_a, part_b
LIMIT 100
"""


TRIANGLE_MIN_COUNT = 2  # co-purchase support threshold for graph edges


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the item co-purchase graph — the third classic
    graph kernel beside PageRank (`nation_pagerank`) and connected
    components (`dedup_clusters`): nodes are parts, edges are part pairs
    co-bought in >= TRIANGLE_MIN_COUNT orders, and the count of closed
    triangles is the clustering signal (basket-affinity density here; the
    same query is community structure / spam detection elsewhere).

    Plan shape: edges are built once by the row-local basket-pair spelling
    (see `co_purchase_pairs` — k(k-1)/2 per order, all JVM) and cached;
    with the canonical a<b orientation each triangle a<b<c is found exactly
    once as e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) — two hash joins keyed on node
    ids, no windows, and the wedge stream (e1⋈e2) never materializes
    outside the join. At 100 TB the hub-node skew fix is degree-based
    orientation (point each edge at its higher-degree endpoint before the
    wedge join — bounds per-key wedges by sqrt(|E|), Suri & Vassilvitskii
    '11); the demo keeps id order, which the oracle replays exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _basket_pairs(li)
        .filter(F.col("n") >= TRIANGLE_MIN_COUNT)
        .select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        # feeds three join legs + two audit aggregates; localCheckpoint
        # (not cache) so the blocks are reference-GC'd after the query's
        # frames drop instead of pinning in the session cache
        .localCheckpoint()
    )
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            edges.alias("e3"),
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("a").alias("x"))
        .unionByName(edges.select(F.col("b").alias("x")))
        .agg(F.countDistinct("x").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(n_edges).crossJoin(tri).select(
        "n_nodes", "n_edges", "n_triangles"
    )


TRIANGLE_COUNT_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM baskets a
    JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRIANGLE_MIN_COUNT}
)
SELECT
    CAST((SELECT COUNT(DISTINCT x) FROM
          (SELECT a AS x FROM edges UNION ALL SELECT b AS x FROM edges))
        AS BIGINT) AS n_nodes,
    CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
    CAST((SELECT COUNT(*) FROM edges e1
          JOIN edges e2 ON e2.a = e1.b
          JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
        AS BIGINT) AS n_triangles
"""


# -- period-over-period growth ------------------------------------------------

def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the
    window-over-aggregate report every revenue dashboard leads with.

    The fact collapses to |months| rows (exact e4 sums, map-side combined)
    BEFORE any window runs, so the lag(1)/lag(12) windows sort dozens of
    rows, not the fact. Growth ratios divide exact BIGINTs in binary64
    (portable); the first month's MoM and first year's YoY are NULL by
    construction, not zero."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000, 0
    ).cast("long")
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").cast("string").alias("month")
    ).agg(F.sum(rev_e4).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines"))
    w = Window.orderBy("month")
    prev = F.lag("rev_e4", 1).over(w)
    prev_year = F.lag("rev_e4", 12).over(w)
    return monthly.select(
        "month",
        (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
        "n_lines",
        F.round((F.col("rev_e4") - prev) * 100.0 / prev, 4).alias("mom_pct"),
        F.round((F.col("rev_e4") - prev_year) * 100.0 / prev_year, 4).alias("yoy_pct"),
    ).orderBy("month")


MONTHLY_REVENUE_GROWTH_ORACLE = """
WITH monthly AS (
    SELECT CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS month,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS rev_e4,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY 1
)
SELECT month,
       ((rev_e4 + 50) // 100) / 100.0 AS revenue,
       n_lines,
       ROUND((rev_e4 - LAG(rev_e4, 1) OVER (ORDER BY month)) * 100.0
             / LAG(rev_e4, 1) OVER (ORDER BY month), 4) AS mom_pct,
       ROUND((rev_e4 - LAG(rev_e4, 12) OVER (ORDER BY month)) * 100.0
             / LAG(rev_e4, 12) OVER (ORDER BY month), 4) AS yoy_pct
FROM monthly
ORDER BY month
"""


# -- association rules over co-purchase pairs ------------------------------------

RULES_TOP = 50


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules from the co-purchase pairs:
    support, directional confidences conf(a→b)=n_ab/n_a and conf(b→a),
    and lift = N·n_ab/(n_a·n_b) — the Apriori/recommendation output the
    pair census (`co_purchase_pairs`) feeds. Lift > 1 = the pair co-occurs
    above independence; the top-50 by lift is the "customers who bought X
    also bought Y" table.

    Plan: the basket collapse runs ONCE and feeds both the row-local pair
    build and the per-item basket counts (cheap re-aggregation of the
    collapsed frame, not a fact rescan); item counts join the pair frame
    twice on near-unique keys (skew-free), the basket total N is a 1-row
    broadcast. All ratios are spelled identically in both engines before
    the 6-dp round."""
    li = load_table(spark, sf_dir, "lineitem")
    # the basket collapse feeds THREE consumers (pairs, item counts, N)
    # and re-executes per consumer (verified: 4 scans in the executed
    # plan) — deliberately UNcheckpointed: a localCheckpoint measured
    # SLOWER at x1 AND x10 (2.2→2.3 s / 4.0→5.2 s; the item/N consumers
    # are cheap narrow re-aggregations, and eagerly materializing 150k
    # basket arrays costs more than recomputing them). Contrast
    # copurchase_communities, where the checkpoint guards a 3-round
    # ITERATIVE consumer and measured 4x faster.
    baskets = _baskets(li)
    pairs = (
        _pairs_of(baskets)
        .select("part_a", "part_b", F.col("n").alias("n_ab"))
        .filter(F.col("n_ab") >= CO_PURCHASE_MIN_COUNT)
    )
    item = baskets.select(F.explode("parts").alias("part")).groupBy(
        "part"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    n = baskets.agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    ia = item.select(F.col("part").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("part").alias("part_b"), F.col("n_item").alias("n_b"))
    lift = F.round(
        (F.col("n_orders") * F.col("n_ab"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        6,
    )
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
                "conf_a_b"
            ),
            F.round(F.col("n_ab") / F.col("n_b").cast("double"), 6).alias(
                "conf_b_a"
            ),
            lift.alias("lift"),
        )
    )
    return (
        out.orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(RULES_TOP)
    )


ASSOCIATION_RULES_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
    FROM baskets a
    JOIN baskets b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {CO_PURCHASE_MIN_COUNT}
),
item AS (SELECT l_partkey AS part, COUNT(*) AS n_item FROM baskets GROUP BY 1),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
      FROM baskets)
SELECT p.part_a, p.part_b, p.n_ab,
       ROUND(p.n_ab / CAST(ia.n_item AS DOUBLE), 6) AS conf_a_b,
       ROUND(p.n_ab / CAST(ib.n_item AS DOUBLE), 6) AS conf_b_a,
       ROUND((n.n_orders * p.n_ab)
             / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)), 6)
           AS lift
FROM pairs p
JOIN item ia ON ia.part = p.part_a
JOIN item ib ON ib.part = p.part_b
CROSS JOIN n
ORDER BY lift DESC, p.part_a, p.part_b
LIMIT {RULES_TOP}
"""


# -- label-propagation communities over the co-purchase graph ---------------------

# Full-round CEILING for the semi-synchronous schedule, not a fixed
# count: the kernel stops at the first full round that changes no label
# (the fixpoint). The old fixed-3 SYNCHRONOUS schedule honestly reported
# converged=false at every round budget — measured r6: ~1700/4900 nodes
# flip every extra round, the classic bipartite-ish min-label 2-cycle
# that no round count fixes (r6 verdict item 5 / nit 2).
LPA_ROUNDS_MAX = 12
LPA_MIN_COUNT = TRIANGLE_MIN_COUNT  # the SAME graph as triangle_count


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the item co-purchase graph by SEMI-
    synchronous label propagation (Raghavan et al. 2007; half-round
    schedule after Cordasco & Gargano 2011): every node starts as its
    own label and each full round updates first the even-id half, then
    the odd-id half, each node adopting the most frequent label among
    its neighbors-plus-itself (the self-vote / label-retention variant)
    with ties broken toward the SMALLEST label. The staggered halves
    break the cross-parity 2-cycle (each half sees the other half's
    fresh labels) and the self-vote settles same-parity pairwise swaps
    (both sides see the same tie and pick the same min), so real graphs
    actually reach the fixpoint — measured at sf0.01/sf0.1: 5/4 rounds
    where the r6 synchronous schedule never converged; the update rule
    stays deterministic, so the trajectory is engine-replayable. Output:
    community sizes. The fourth graph kernel beside PageRank, connected
    components, and the triangle census — communities are
    basket-affinity clusters where components only prove reachability.

    Plan shape per half-round: one (edge ⋈ label) hash join + two
    map-side-combined aggregates on (node, label) pairs only — never
    adjacency materialization; rounds are data-adaptive under
    ``LPA_ROUNDS_MAX`` with a localCheckpoint per full round truncating
    the lineage (the CC-loop idiom), and the fixpoint check is a count
    on the already-checkpointed frame. Skew = hub nodes fan into the
    per-node vote aggregate, which partial aggregation absorbs. The
    oracle replays the identical trajectory by unrolling all
    ROUNDS_MAX full rounds (identity past the fixpoint) and re-deriving
    rounds_used/converged from the first no-change round."""
    li = load_table(spark, sf_dir, "lineitem")
    # checkpoint the PAIRS (before the two-orientation union), not the
    # union: each union branch is a separate consumer, so a post-union
    # checkpoint would still run the basket collapse twice
    pairs = (
        _basket_pairs(li)
        .filter(F.col("n") >= LPA_MIN_COUNT)
        .select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        .localCheckpoint()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = lpa_labels(edges, LPA_ROUNDS_MAX)
    return (
        labels.groupBy(
            F.col("label").alias("community"), "rounds_used", "converged"
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select("community", "n_nodes", "rounds_used", "converged")
        .orderBy(F.col("n_nodes").desc(), F.col("community").asc())
    )


def _lpa_half_round(edges: DataFrame, lbl: DataFrame, parity: int) -> DataFrame:
    """One semi-synchronous half-round: nodes with id-parity ``parity``
    adopt their neighbor-majority label (ties → smallest) from the
    CURRENT frame; the other half passes through unchanged. Every node
    has ≥1 neighbor (nodes come from the symmetric edge set), so the
    vote side covers the whole updating half."""
    votes = (
        edges.filter(F.col("src") % 2 == parity)
        .join(lbl.select(F.col("v").alias("dst"), "label"), "dst")
        .groupBy("src", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    updated = (
        votes.groupBy("src")
        .agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
            )["l"].alias("label")
        )
        .select(F.col("src").alias("v"), "label")
    )
    return lbl.filter(F.col("v") % 2 != parity).unionByName(updated)


def lpa_labels(edges: DataFrame, rounds_max: int) -> DataFrame:
    """Adaptive semi-synchronous label propagation with the truncation
    self-report: run full rounds (even half-round then odd half-round)
    until one changes no label or ``rounds_max`` rounds, whichever
    first. The returned (v, label) frame carries ``rounds_used`` (the
    first no-change round, or the ceiling) and ``converged`` (whether
    the fixpoint was observed) — at a 100 TB density that outruns the
    ceiling a caller reads converged=false instead of trusting a
    small-scale test. ``edges`` must be the symmetric (src, dst)
    orientation. Cost per round: two half-round join-aggs plus one
    change count on the checkpointed frame.

    The vote is SELF-INCLUSIVE (label retention): every node counts
    itself as one supporter of its current label, implemented as a
    self-loop per node. The half-round schedule alone still lets two
    ADJACENT SAME-PARITY nodes swap labels forever (measured at sf0.01:
    the change count fell 1721 → 9 and then 9 held steady for 10+
    rounds); the self-vote turns a pairwise swap into a tie that the
    smallest-label rule settles identically on both sides, and the
    measured trajectory then actually hits zero."""
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint()
    )
    edges = edges.unionByName(
        labels.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    )
    rounds_used, converged = rounds_max, False
    for r in range(1, rounds_max + 1):
        new = labels
        for parity in (0, 1):
            new = _lpa_half_round(edges, new, parity)
        # fuse the changed-count into the round's one materialization
        # (r11, r10 verdict item 7): checkpoint the (new ⋈ prev) frame —
        # same |V| rows, one extra narrow column — and observe the
        # changed-count on that plan, so each round runs ONE Spark job
        # where checkpoint + a separate count (which performed the
        # identical join) ran two. Next round's labels are a lazy select
        # over the checkpointed frame; label values, the change counts,
        # rounds_used and converged are unchanged.
        obs = Observation(f"lpa_chg_r{r}")
        joined = (
            new.join(
                labels.select(
                    F.col("v").alias("pv"), F.col("label").alias("prev_label")
                ),
                new["v"] == F.col("pv"),
            )
            .select("v", "label", "prev_label")
            .observe(
                obs,
                F.count(
                    F.when(F.col("label") != F.col("prev_label"), 1)
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = obs.get["chg"]
        labels = joined.select("v", "label")
        if changed == 0:  # a full round changed nothing: fixpoint reached
            rounds_used, converged = r, True
            break
    return labels.select(
        "v",
        "label",
        F.lit(rounds_used).cast("int").alias("rounds_used"),
        F.lit(converged).alias("converged"),
    )


def copurchase_communities_oracle() -> str:
    # Two CTEs per full round (even half, odd half) — AS MATERIALIZED
    # because each is referenced twice (pass-through + vote side) and
    # DuckDB 1.0 inlines single-use CTEs (the k-core 147 s lesson).
    # Rounds past the fixpoint are the identity, so unrolling all
    # ROUNDS_MAX rounds yields EXACTLY the adaptive kernel's final
    # state; rounds_used is re-derived as the first full round whose
    # label frame matches its predecessor — the same observation the
    # kernel's early-stop makes.
    rounds = []
    prev = "s0"
    for r in range(1, LPA_ROUNDS_MAX + 1):
        for parity, tag in ((0, "a"), (1, "s")):
            cur = f"{tag}{r}"
            rounds.append(f"""
{cur} AS MATERIALIZED (
    SELECT v, label FROM {prev} WHERE v % 2 <> {parity}
    UNION ALL
    SELECT v, label FROM (
        SELECT e.src AS v, l.label,
               ROW_NUMBER() OVER (
                   PARTITION BY e.src ORDER BY COUNT(*) DESC, l.label ASC
               ) AS rn
        FROM e JOIN {prev} l ON l.v = e.dst
        WHERE e.src % 2 = {parity}
        GROUP BY e.src, l.label
    ) WHERE rn = 1
)""")
            prev = cur
    changes = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, (SELECT COUNT(*) FROM s{r} cur "
        f"JOIN s{r - 1} prv ON cur.v = prv.v "
        f"WHERE cur.label <> prv.label) AS ch"
        for r in range(1, LPA_ROUNDS_MAX + 1)
    )
    return f"""
WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM baskets a
    JOIN baskets b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {LPA_MIN_COUNT}
),
esym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
),
-- self-loop per node = the kernel's self-inclusive vote (label retention)
e AS MATERIALIZED (
    SELECT src, dst FROM esym
    UNION ALL
    SELECT DISTINCT src, src FROM esym
),
s0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label FROM esym),
{','.join(rounds)},
chg AS ({changes}),
ru AS (
    SELECT CAST(COALESCE(MIN(CASE WHEN ch = 0 THEN r END),
                         {LPA_ROUNDS_MAX}) AS INTEGER) AS rounds_used,
           COUNT(CASE WHEN ch = 0 THEN 1 END) > 0 AS converged
    FROM chg
)
SELECT label AS community, COUNT(*) AS n_nodes,
       ru.rounds_used, ru.converged
FROM s{LPA_ROUNDS_MAX} CROSS JOIN ru
GROUP BY label, ru.rounds_used, ru.converged
ORDER BY n_nodes DESC, community ASC
"""


# -- hour-of-week seasonality profile ------------------------------------------------


def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity profile: events bucketed by (day-of-week,
    hour-of-day) with volume share and mean value — the seasonality
    surface capacity planning and anomaly baselining read (the hourly
    z-score op flags deviations; this is the baseline shape itself).

    Day-of-week derives from INTEGER epoch-day arithmetic
    ((days + 4) % 7, anchored on 1970-01-01 = Thursday) rather than each
    engine's dayofweek() — Spark numbers Sunday=1..7, DuckDB Sunday=0..6,
    and the off-by-one would silently rotate the profile. One scan, a
    168-key map-side-combined aggregate, and a 1-row total broadcast."""
    ev = load_table(spark, sf_dir, "events")
    # floor() in BOTH engines: DuckDB CAST(double AS BIGINT) ROUNDS
    # while Spark truncates — floor-then-cast is the portable spelling
    dow = (F.floor(ts_us("ts") / F.lit(86_400_000_000)).cast("bigint") + 4) % 7
    keyed = ev.select(
        dow.cast("int").alias("dow"),
        F.hour("ts").alias("hour"),
        "value",
    )
    counts = keyed.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    total = counts.agg(F.sum("n_events").cast("double").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            F.round(F.col("n_events") / F.col("tot"), 6).alias("share"),
            "avg_value",
        )
        .orderBy("dow", "hour")
    )


EVENTS_WEEKLY_SEASONALITY_ORACLE = """
WITH keyed AS (
    SELECT CAST((CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) + 4) % 7 AS INT)
               AS dow,
           hour(ts) AS hour, value
    FROM events
),
counts AS (
    SELECT dow, hour, COUNT(*) AS n_events,
           ROUND(AVG(value), 6) AS avg_value
    FROM keyed GROUP BY dow, hour
),
total AS (SELECT CAST(SUM(n_events) AS DOUBLE) AS tot FROM counts)
SELECT dow, hour, n_events,
       ROUND(n_events / t.tot, 6) AS share, avg_value
FROM counts CROSS JOIN total t
ORDER BY dow, hour
"""


# -- CUSUM changepoint detection ----------------------------------------------


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistic over the hourly event-volume series:
    both one-sided cumulative sums of the deviation from the series mean,
    computed through the closed form S⁺_i = prefix_i − min(0, min_{j≤i}
    prefix_j) (and S⁻ via the running max; the 0 is the virtual empty
    prefix, which carries the max(0, ·) clamp) — the recursive definition is
    NOT window-expressible, the prefix-extremum identity is, in any
    engine. Emits the statistic per hour plus an is_peak flag on the
    hour where S⁺ attains its global maximum (the most likely upward
    changepoint).

    Engine-parity: deviations are scaled by n (the hour count) so every
    prefix/extremum/statistic is exact int64 arithmetic — n·x_i − T —
    and the single float division happens once, in the rounded output.

    Scale: the raw stream reduces to a calendar-sized hourly frame in one
    shuffle; the cumulative windows then run over |hours| rows (87k rows
    for a decade — driver-trivial), so the unavoidable single-partition
    ordered window is over the REDUCED series, never the raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        ts_s(F.date_trunc("hour", F.col("ts"))).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = hourly.agg(
        F.sum("n_events").alias("t_sum"), F.count(F.lit(1)).alias("n_hours")
    )
    w = Window.orderBy("hour_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = (
        hourly.crossJoin(F.broadcast(tot))
        .withColumn(
            "dev_n", F.col("n_hours") * F.col("n_events") - F.col("t_sum")
        )
        .withColumn("prefix", F.sum("dev_n").over(w))
        # the running extremum must include the virtual empty prefix 0
        # (prefix_{-1}) or the first rows lose their max(0, ·) clamp
        .withColumn(
            "s_pos",
            F.col("prefix") - F.least(F.lit(0), F.min("prefix").over(w)),
        )
        .withColumn(
            "s_neg",
            F.greatest(F.lit(0), F.max("prefix").over(w)) - F.col("prefix"),
        )
    )
    peak = F.max("s_pos").over(Window.partitionBy())
    return scored.select(
        "hour_start",
        "n_events",
        F.round(F.col("s_pos") / F.col("n_hours"), 6).alias("cusum_pos"),
        F.round(F.col("s_neg") / F.col("n_hours"), 6).alias("cusum_neg"),
        ((F.col("s_pos") == peak) & (peak > 0)).alias("is_peak"),
    ).orderBy("hour_start")


EVENTS_CUSUM_ORACLE = """
WITH hourly AS (
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
),
tot AS (
    SELECT SUM(n_events) AS t_sum, COUNT(*) AS n_hours FROM hourly
),
scored AS (
    SELECT hour_start, n_events, n_hours,
           SUM(n_hours * n_events - t_sum)
               OVER (ORDER BY hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prefix
    FROM hourly CROSS JOIN tot
),
stat AS (
    SELECT hour_start, n_events, n_hours,
           prefix - LEAST(0, MIN(prefix)
               OVER (ORDER BY hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS s_pos,
           GREATEST(0, MAX(prefix)
               OVER (ORDER BY hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               - prefix AS s_neg
    FROM scored
)
SELECT hour_start, n_events,
       ROUND(CAST(s_pos AS DOUBLE) / n_hours, 6) AS cusum_pos,
       ROUND(CAST(s_neg AS DOUBLE) / n_hours, 6) AS cusum_neg,
       s_pos = MAX(s_pos) OVER () AND MAX(s_pos) OVER () > 0 AS is_peak
FROM stat
ORDER BY hour_start
"""


# -- link prediction over the co-purchase graph -------------------------------

LINK_PRED_TOP = 50  # predicted edges kept
LINK_AA_SCALE = 1_000_000  # micro-units for the Adamic-Adar sum
LINK_ADJ_CAP = 64  # strongest-neighbor cap: wedge volume <= C(64,2) per hub


def link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood link prediction on the co-purchase item graph (same
    edge set as ``triangle_count``): for every NON-adjacent part pair that
    shares at least one neighbor, score common-neighbors, Jaccard
    |Γa∩Γc| / |Γa∪Γc|, and Adamic-Adar Σ_b 1/ln(deg b) — the classic
    recommend-an-edge triad (Liben-Nowell & Kleinberg '03), here "parts
    likely to be co-bought next".

    Engine-parity: Adamic-Adar is a float SUM, so each term is floored to
    integer micro-units first (FLOOR then cast — DuckDB CAST alone
    rounds, Spark truncates) making the aggregation order-free; ln(deg)
    on the same int is bit-identical IEEE in both engines. deg ≥ 2 for
    any shared neighbor (it has two wedge spokes), so ln > 0.

    Plan: wedges come from one self-join of the symmetrized adjacency
    keyed on the hub b — each candidate (a<c) appears once per shared
    neighbor and aggregates map-side. Known edges leave via one anti-join
    on the canonical pair. Hub skew is the classic wedge risk, so the
    adjacency is CAPPED at the LINK_ADJ_CAP strongest neighbors per node
    (co-purchase support desc, id asc — a deterministic total order both
    engines replay bit-identically), bounding wedge volume at C(K,2) per
    hub ≈ K·|E| overall: the ×10 replica densifies this graph enough that
    the uncapped wedge join measured 37× (97 s); capped it stays linear.
    Where the cap binds, degrees (and so Jaccard) are computed over the
    same capped neighborhood — the standard top-K sparsification of
    item-similarity graphs, applied identically in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _basket_pairs(li)
        .filter(F.col("n") >= TRIANGLE_MIN_COUNT)
        .select("part_a", "part_b", "n")
        .localCheckpoint()
    )
    w_cap = Window.partitionBy("node").orderBy(F.col("n").desc(), "nbr")
    adj = (
        edges.select(
            F.col("part_a").alias("node"), F.col("part_b").alias("nbr"), "n"
        )
        .unionByName(
            edges.select(
                F.col("part_b").alias("node"),
                F.col("part_a").alias("nbr"),
                "n",
            )
        )
        .withColumn("rnk", F.row_number().over(w_cap))
        .filter(F.col("rnk") <= LINK_ADJ_CAP)
        .select("node", "nbr")
    )
    deg = adj.groupBy(F.col("node").alias("b")).agg(
        F.count(F.lit(1)).alias("deg_b")
    )
    aa_term = F.floor(LINK_AA_SCALE / F.log(F.col("deg_b").cast("double"))).cast(
        "bigint"
    )
    wedges = (
        adj.select(F.col("nbr").alias("b"), F.col("node").alias("a"))
        .join(
            adj.select(F.col("nbr").alias("b"), F.col("node").alias("c")),
            "b",
        )
        .filter(F.col("a") < F.col("c"))
        .join(deg, "b")
        .groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).alias("common_nbrs"),
            F.sum(aa_term).alias("aa_u"),
        )
    )
    cand = wedges.join(
        edges,
        (wedges.a == edges.part_a) & (wedges.c == edges.part_b),
        "left_anti",
    )
    dnode = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    return (
        cand.join(dnode.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(dnode.select(F.col("node").alias("c"), F.col("deg").alias("deg_c")), "c")
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "common_nbrs",
            F.round(
                F.col("common_nbrs")
                / (F.col("deg_a") + F.col("deg_c") - F.col("common_nbrs")),
                6,
            ).alias("jaccard"),
            F.round(F.col("aa_u") / LINK_AA_SCALE, 6).alias("adamic_adar"),
        )
        .orderBy(
            F.col("common_nbrs").desc(),
            F.col("adamic_adar").desc(),
            "part_a",
            "part_b",
        )
        .limit(LINK_PRED_TOP)
    )


LINK_PREDICTION_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n
    FROM baskets a
    JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRIANGLE_MIN_COUNT}
),
adj AS (
    SELECT node, nbr FROM (
        SELECT node, nbr,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY n DESC, nbr) AS rnk
        FROM (
            SELECT part_a AS node, part_b AS nbr, n FROM edges
            UNION ALL
            SELECT part_b AS node, part_a AS nbr, n FROM edges
        )
    ) WHERE rnk <= {LINK_ADJ_CAP}
),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
wedges AS (
    SELECT x.node AS a, y.node AS c,
           COUNT(*) AS common_nbrs,
           CAST(SUM(CAST(FLOOR({LINK_AA_SCALE} / ln(CAST(d.deg AS DOUBLE)))
                         AS BIGINT)) AS BIGINT) AS aa_u
    FROM adj x
    JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
    JOIN deg d ON d.node = x.nbr
    GROUP BY 1, 2
),
cand AS (
    SELECT w.* FROM wedges w
    ANTI JOIN edges e ON e.part_a = w.a AND e.part_b = w.c
)
SELECT cand.a AS part_a, cand.c AS part_b,
       CAST(common_nbrs AS BIGINT) AS common_nbrs,
       ROUND(CAST(common_nbrs AS DOUBLE)
             / (da.deg + dc.deg - common_nbrs), 6) AS jaccard,
       ROUND(CAST(aa_u AS DOUBLE) / {LINK_AA_SCALE}, 6) AS adamic_adar
FROM cand
JOIN deg da ON da.node = cand.a
JOIN deg dc ON dc.node = cand.c
ORDER BY common_nbrs DESC, adamic_adar DESC, part_a, part_b
LIMIT {LINK_PRED_TOP}
"""


# -- trailing EWMA baseline ---------------------------------------------------

EWMA_WINDOW_H = 24  # trailing window; ratio-2 weights halve per hour of lag


def events_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted hourly-volume baseline: each hour's
    expected volume is the weight-2^(−lag) average of the previous 24
    hours (itself included), plus the observed/expected ratio — the
    smoothed twin of ``events_hourly_anomalies`` (z-score vs a static
    mean) for streams whose level drifts.

    The recursive EWMA is order-dependent; the TRUNCATED form is a pure
    windowed sum, expressed here as a self-join of the hourly frame on a
    bounded hour-lag range so both engines share one spelling. Weights
    2^(23−lag) and the weighted volume sum stay exact int64 (max count ·
    2^24 ≪ 2^63); the single float division happens in the output.

    Scale: the raw stream reduces to |hours| rows first; the range join
    is |hours|·24 — for a decade of data that is 2M pairs, driver-trivial.
    (If the series ever got big, bucket both sides by day and equi-join
    adjacent buckets to keep the range join from going nested-loop.)"""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        ts_s(F.date_trunc("hour", F.col("ts"))).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    a = hourly.select(F.col("hour_start").alias("h"), "n_events")
    b = hourly.select(
        F.col("hour_start").alias("h2"), F.col("n_events").alias("x")
    )
    # single definition of the hour lag, shared by the weight expression
    lag_h = F.floor((F.col("h") - F.col("h2")) / F.lit(3600))
    win = a.join(
        b,
        (F.col("h2") <= F.col("h"))
        & (F.col("h2") > F.col("h") - EWMA_WINDOW_H * 3600),
    ).select(
        "h",
        "n_events",
        "x",
        F.pow(F.lit(2.0), F.lit(EWMA_WINDOW_H - 1) - lag_h)
        .cast("bigint")
        .alias("w"),
    )
    ewma = F.col("num") / F.col("den")
    return (
        win.groupBy(F.col("h").alias("hour_start"), "n_events")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("num"),
            F.sum("w").alias("den"),
        )
        .select(
            "hour_start",
            "n_events",
            F.round(ewma, 6).alias("ewma"),
            F.round(F.col("n_events") / ewma, 6).alias("obs_over_exp"),
        )
        .orderBy("hour_start")
    )


EVENTS_EWMA_ORACLE = f"""
WITH hourly AS (
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
),
win AS (
    SELECT a.hour_start AS h, a.n_events, b.n_events AS x,
           CAST(POWER(2.0, {EWMA_WINDOW_H - 1}
                           - (a.hour_start - b.hour_start) // 3600)
                AS BIGINT) AS w
    FROM hourly a
    JOIN hourly b
      ON b.hour_start <= a.hour_start
     AND b.hour_start > a.hour_start - {EWMA_WINDOW_H} * 3600
),
agg AS (
    SELECT h AS hour_start, n_events,
           SUM(w * x) AS num, SUM(w) AS den
    FROM win GROUP BY 1, 2
)
SELECT hour_start, n_events,
       ROUND(CAST(num AS DOUBLE) / den, 6) AS ewma,
       ROUND(n_events / (CAST(num AS DOUBLE) / den), 6) AS obs_over_exp
FROM agg
ORDER BY hour_start
"""


# -- classical seasonal decomposition -----------------------------------------

SEAS_HALF = 12  # centered 2x24 moving-average half-width (hours)


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly volume
    series: trend = centered 2×24 moving average (the textbook even-window
    form: endpoints half-weighted), seasonal = per-hour-of-day mean of the
    detrended series, residual = observed − trend − seasonal. The
    monitoring decomposition that separates "traffic grows" from "it's
    3 am" before an anomaly rule fires.

    Exact-arithmetic spelling: trend·48 = (Σ rows∈±12h) + (Σ rows∈±11h)
    over RANGE frames (half-weighted endpoints fall out of the sum of the
    two frames), all int64; detrended·48 = 48·x − trend48; the per-hod
    seasonal index is one int ratio Σdetr48/(48·n) and every float
    appears once, in the identically-written output expressions. The
    indices are not re-centered: the detrended series already sums to
    ≈0 per hod, and exact centering would need a cross-hod rational sum
    (lcm denominators) for zero monitoring value.

    Only hours with a COMPLETE ±12h window decompose (RANGE count = 25 —
    robust to gaps, no partial-window bias). Scale: raw stream → |hours|
    rows first; windows/aggregates run on the calendar-sized frame."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        ts_s(F.date_trunc("hour", F.col("ts"))).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_out = (
        Window.orderBy("hour_start")
        .rangeBetween(-SEAS_HALF * 3600, SEAS_HALF * 3600)
    )
    w_in = (
        Window.orderBy("hour_start")
        .rangeBetween(-(SEAS_HALF - 1) * 3600, (SEAS_HALF - 1) * 3600)
    )
    detr = (
        hourly.withColumn("n_win", F.count(F.lit(1)).over(w_out))
        .withColumn(
            "trend48",
            F.sum("n_events").over(w_out) + F.sum("n_events").over(w_in),
        )
        .filter(F.col("n_win") == 2 * SEAS_HALF + 1)
        .withColumn("detr48", 48 * F.col("n_events") - F.col("trend48"))
        .withColumn("hod", F.expr("(hour_start DIV 3600) % 24"))
    )
    seas = detr.groupBy(F.col("hod").alias("h")).agg(
        F.sum("detr48").alias("a"), F.count(F.lit(1)).alias("cnt")
    )
    s_idx = F.col("a").cast("double") / (48 * F.col("cnt"))
    return (
        detr.join(F.broadcast(seas), detr.hod == seas.h)
        .select(
            "hour_start",
            "n_events",
            F.round(F.col("trend48") / 48.0, 6).alias("trend"),
            F.round(s_idx, 6).alias("seasonal"),
            F.round(F.col("detr48") / 48.0 - s_idx, 6).alias("residual"),
        )
        .orderBy("hour_start")
    )


EVENTS_SEASONAL_DECOMPOSE_ORACLE = f"""
WITH hourly AS (
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
),
win AS (
    SELECT hour_start, n_events,
           COUNT(*) OVER (ORDER BY hour_start
                          RANGE BETWEEN {SEAS_HALF * 3600} PRECEDING
                                AND {SEAS_HALF * 3600} FOLLOWING) AS n_win,
           SUM(n_events) OVER (ORDER BY hour_start
                               RANGE BETWEEN {SEAS_HALF * 3600} PRECEDING
                                     AND {SEAS_HALF * 3600} FOLLOWING)
           + SUM(n_events) OVER (ORDER BY hour_start
                                 RANGE BETWEEN {(SEAS_HALF - 1) * 3600}
                                       PRECEDING
                                       AND {(SEAS_HALF - 1) * 3600} FOLLOWING)
               AS trend48
    FROM hourly
),
detr AS (
    SELECT hour_start, n_events, trend48,
           48 * n_events - trend48 AS detr48,
           (hour_start // 3600) % 24 AS hod
    FROM win WHERE n_win = {2 * SEAS_HALF + 1}
),
seas AS (
    SELECT hod AS h, SUM(detr48) AS a, COUNT(*) AS cnt
    FROM detr GROUP BY 1
)
SELECT hour_start, n_events,
       ROUND(trend48 / 48.0, 6) AS trend,
       ROUND(CAST(a AS DOUBLE) / (48 * cnt), 6) AS seasonal,
       ROUND(CAST(detr48 AS DOUBLE) / 48.0
             - CAST(a AS DOUBLE) / (48 * cnt), 6) AS residual
FROM detr JOIN seas ON seas.h = detr.hod
ORDER BY hour_start
"""


# -- Theil-Sen robust trend ----------------------------------------------------


def theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend: the Theil–Sen estimator — median of all
    pairwise day-slopes, 29% breakdown point, immune to the promo-spike
    days that drag a least-squares fit — reported with the slope
    distribution's quartiles so the spread is visible, not just the
    point estimate.

    The pairwise-slope set is quadratic in DAYS, not rows: the raw table
    reduces to |days| daily sums first (a decade is ~3.6k days → 6.6M
    pairs, trivial next to one fact-table scan; at larger calendars
    subsample pairs by portable hash exactly like weighted_sample_aes).
    Slopes are identical single divisions of exact cent/day int64s and
    the quantiles interpolate the same doubles in both engines. (An OLS
    companion via n·Σxy − Σx·Σy moments was deliberately left out: those
    products exceed int64 near sf≈1 — the at-scale OLS spelling is a
    centered double-moment pass, which would break exact engine parity
    here for no monitoring gain.)

    The quantiles are SORT-BASED order statistics, not the `percentile`
    aggregate: exact `percentile` keeps a per-distinct-value counts map
    (~|pairs| entries) per expression — measured 22 s at sf0.1 for three
    of them, 8 s for the shared-buffer array form, while one sort of the
    slope column + row_number + interpolation between the two bracketing
    order statistics (the identical quantile_cont h = (n−1)·p math) runs
    the whole query in ~2 s. n_pairs = d·(d−1)/2 comes from the tiny
    daily frame, broadcast to pick the bracketing ranks declaratively."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        # three consumers (both pair sides + the n_pairs scalar) would
        # each re-run the fact scan; the collapsed frame is |days| rows
        .localCheckpoint()
    )
    a = daily.select(F.col("day").alias("d1"), F.col("cents").alias("c1"))
    b = daily.select(F.col("day").alias("d2"), F.col("cents").alias("c2"))
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("d2") - F.col("d1"))
        ).alias("slope")
    )
    n = daily.agg(F.count(F.lit(1)).alias("d")).select(
        (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n")
    )
    # Two-level rank instead of one global-order row_number (which is a
    # single task sorting the whole pair frame — the engine's last
    # global-order window on a frame that can reach millions of rows):
    # range-partition by slope (pid increases with the value range),
    # row_number within each partition, then lift by the exclusive
    # prefix sum of partition counts — a |partitions|-row summary,
    # broadcast back. Global rank is exact regardless of where the
    # boundaries fall. localCheckpoint for the same reason as
    # watermark_late_arrivals: spark_partition_id over a sampled range
    # partitioner re-samples per execution, and the local-rank branch
    # and the counts branch must see the SAME assignment.
    parted = (
        slopes.repartitionByRange(shuffle_partitions(spark), "slope")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = Window.partitionBy("pid").orderBy("slope")
    w_prefix = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    counts = (
        parted.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "off", F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0))
        )
    )
    ranked = (
        parted.withColumn("lr", F.row_number().over(w_local))
        .join(F.broadcast(counts.select("pid", "off")), "pid")
        .select("slope", (F.col("lr") + F.col("off")).alias("r"))
        .crossJoin(F.broadcast(n))
    )

    def q(p: float, name: str):
        h = (F.col("n") - 1) * F.lit(p)  # quantile_cont's 0-based offset
        lo = F.floor(h) + 1  # 1-based bracketing ranks
        hi = F.least(lo + 1, F.col("n"))
        frac = h - F.floor(h)
        v_lo = F.max(F.when(F.col("r") == lo, F.col("slope")))
        v_hi = F.max(F.when(F.col("r") == hi, F.col("slope")))
        return F.round(
            (v_lo + F.max(frac) * (v_hi - v_lo)) / 100.0, 4
        ).alias(name)

    return ranked.agg(
        F.max("n").alias("n_pairs"),
        q(0.25, "slope_q1"),
        q(0.5, "theil_sen_slope"),
        q(0.75, "slope_q3"),
    )


THEIL_SEN_REVENUE_TREND_ORACLE = """
WITH daily AS (
    SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS day,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
),
slopes AS (
    SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.day - a.day) AS slope
    FROM daily a JOIN daily b ON a.day < b.day
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(slope, 0.25) / 100.0, 4) AS slope_q1,
       ROUND(quantile_cont(slope, 0.5) / 100.0, 4) AS theil_sen_slope,
       ROUND(quantile_cont(slope, 0.75) / 100.0, 4) AS slope_q3
FROM slopes
"""


# -- degree distribution power-law fit ----------------------------------------

PL_SCALE = 1_000_000  # micro-units for the exact-integer log-sum


def degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree statistics + continuous-MLE power-law exponent for the
    co-purchase graph (same support-≥2 edge set as ``triangle_count``):
    α = 1 + n / Σ ln(d/(dmin−½)) with dmin = 1 (Clauset-Shalizi-Newman
    '09) — the one-number test of whether the item graph is hub-dominated
    (α ≲ 2.5) before wedge-heavy kernels like ``link_prediction`` run
    uncapped.

    Each node's log term is floored to integer micro-units (identical
    double → both engines floor) so the sum is order-free; mean degree
    divides exact ints; α's float chain runs once on identical operands.
    Scale: degrees are one count per node; everything after is a
    |nodes|-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _basket_pairs(li)
        .filter(F.col("n") >= TRIANGLE_MIN_COUNT)
        .select("part_a", "part_b")
    )
    deg = (
        edges.select(F.col("part_a").alias("node"))
        .unionByName(edges.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").alias("sum_d"),
        F.max("d").alias("max_deg"),
        F.sum(
            F.floor(
                F.lit(float(PL_SCALE))
                * F.log(F.col("d").cast("double") / 0.5)
            ).cast("bigint")
        ).alias("logsum_u"),
    )
    alpha = F.lit(1.0) + F.col("n_nodes") / (
        F.col("logsum_u").cast("double") / PL_SCALE
    )
    return agg.select(
        "n_nodes",
        F.col("max_deg"),
        F.round(F.col("sum_d") / F.col("n_nodes"), 6).alias("mean_deg"),
        F.round(alpha, 4).alias("alpha_mle"),
    )


DEGREE_POWERLAW_FIT_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM baskets a
    JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRIANGLE_MIN_COUNT}
),
deg AS (
    SELECT node, COUNT(*) AS d FROM (
        SELECT part_a AS node FROM edges
        UNION ALL
        SELECT part_b AS node FROM edges
    ) GROUP BY 1
),
agg AS (
    SELECT COUNT(*) AS n_nodes, SUM(d) AS sum_d, MAX(d) AS max_deg,
           SUM(CAST(FLOOR({float(PL_SCALE)!r} * ln(CAST(d AS DOUBLE) / 0.5))
                    AS BIGINT)) AS logsum_u
    FROM deg
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(max_deg AS BIGINT) AS max_deg,
       ROUND(CAST(sum_d AS DOUBLE) / n_nodes, 6) AS mean_deg,
       ROUND(1.0 + n_nodes / (CAST(logsum_u AS DOUBLE) / {PL_SCALE}), 4)
           AS alpha_mle
FROM agg
"""


# -- conversion latency --------------------------------------------------------


def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion latency distribution: for every purchase,
    the time since that user's LATEST preceding click (the as-of lookup
    ``purchase_click_attribution`` counts, here measured), reduced to
    attribution coverage + exact latency percentiles — the funnel-health
    number a growth dashboard tracks.

    Latencies are exact microsecond int64 diffs (ts_us), so the
    percentile interpolation runs over identical integers in both
    engines; only the final seconds-conversion divides. The per-user
    pair join is bounded by per-user activity (and at 100 TB by the same
    coarse time-bucket prefilter the attribution docstring prescribes);
    the argmax collapses pairs back to |purchases| rows in one grouped
    max before the global percentile reduce."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        ts_us("ts").alias("p_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), ts_us("ts").alias("c_us")
    )
    last_click = (
        purchases.join(
            clicks,
            (purchases.user_id == F.col("cu"))
            & (F.col("c_us") < F.col("p_us")),
            "left",
        )
        .groupBy("purchase_id", "p_us")
        .agg(F.max("c_us").alias("lc_us"))
    )
    return last_click.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("lc_us").isNotNull(), 1).otherwise(0)).alias(
            "n_attributed"
        ),
        F.round(
            F.expr("percentile(p_us - lc_us, 0.5) / 1000000.0"), 4
        ).alias("p50_latency_s"),
        F.round(
            F.expr("percentile(p_us - lc_us, 0.9) / 1000000.0"), 4
        ).alias("p90_latency_s"),
        F.round(
            F.expr("percentile(p_us - lc_us, 0.99) / 1000000.0"), 4
        ).alias("p99_latency_s"),
    )


CONVERSION_LATENCY_STATS_ORACLE = """
WITH purchases AS (
    SELECT user_id, event_id AS purchase_id,
           CAST(epoch_us(ts) AS BIGINT) AS p_us
    FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id AS cu, CAST(epoch_us(ts) AS BIGINT) AS c_us
    FROM events WHERE event_type = 'click'
),
last_click AS (
    SELECT p.purchase_id, p.p_us, MAX(c.c_us) AS lc_us
    FROM purchases p
    LEFT JOIN clicks c ON c.cu = p.user_id AND c.c_us < p.p_us
    GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN lc_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_attributed,
       ROUND(quantile_cont(p_us - lc_us, 0.5) / 1000000.0, 4)
           AS p50_latency_s,
       ROUND(quantile_cont(p_us - lc_us, 0.9) / 1000000.0, 4)
           AS p90_latency_s,
       ROUND(quantile_cont(p_us - lc_us, 0.99) / 1000000.0, 4)
           AS p99_latency_s
FROM last_click
"""


# -- chi-square independence audit --------------------------------------------

CHI2_SCALE = 1_000_000  # micro-units: per-cell terms floored, summed exactly


def event_hour_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and hour-of-day
    (plus Cramér's V effect size): is the traffic MIX time-invariant, or
    do types have distinct diurnal profiles? The one-row statistical gate
    behind the per-cell ``events_weekly_seasonality`` view — V ≈ 0 means
    hourly mixture weights can be global; V ≫ 0 means per-hour routing.

    Expected counts are rationals n_r·n_c/N; each of the |types|×24
    cells' (O−E)²/E terms is evaluated in one identical float chain on
    exact integer marginals, floored to micro-units, and summed exactly
    (order-free). One grouped count over the raw stream; marginals and
    the statistic live on contingency-table-sized frames. hour() on
    TIMESTAMP_NTZ is timezone-free in both engines."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("o"))
    # the FULL r×c grid: unobserved cells carry O=0 but E>0 and belong in
    # the statistic (omitting them silently halves chi2 on sparse tables)
    cells = (
        obs.select("event_type")
        .distinct()
        .crossJoin(obs.select("hod").distinct())
        .join(obs, ["event_type", "hod"], "left")
        .select(
            "event_type", "hod", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    rows_m = cells.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("o").alias("n_r")
    )
    cols_m = cells.groupBy(F.col("hod").alias("h")).agg(
        F.sum("o").alias("n_c")
    )
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("hod").alias("c"),
    )
    # (O - E)²/E with E = n_r·n_c/n, as ((O·n - n_r·n_c)²) / (E·n²):
    # one float chain on exact int64 products (n_r·n_c ≤ n² ≈ 1e8 here;
    # O·n ≤ n² — far inside int64 at any per-cell-feasible scale)
    d = (F.col("o") * F.col("n") - F.col("n_r") * F.col("n_c")).cast("double")
    term = (
        d * d  # explicit square: POWER() is not ULP-identical across libms
        / (
            (F.col("n_r") * F.col("n_c")).cast("double")
            * F.col("n").cast("double")
        )
    )
    scored = (
        cells.join(F.broadcast(rows_m), cells.event_type == rows_m.et)
        .join(F.broadcast(cols_m), cells.hod == cols_m.h)
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "r",
            "c",
            F.floor(F.lit(float(CHI2_SCALE)) * term).cast("bigint").alias(
                "t_u"
            ),
        )
    )
    chi2 = F.col("chi2_u").cast("double") / CHI2_SCALE
    return (
        scored.groupBy("n", "r", "c")
        .agg(F.sum("t_u").alias("chi2_u"), F.count(F.lit(1)).alias("n_cells"))
        .select(
            F.col("n").alias("n_events"),
            "n_cells",
            ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
            F.round(chi2, 4).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2
                    / (
                        F.col("n").cast("double")
                        * (F.least("r", "c") - F.lit(1))
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


EVENT_HOUR_INDEPENDENCE_ORACLE = f"""
WITH obs AS (
    SELECT event_type, hour(ts) AS hod, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
cells AS (
    SELECT g.event_type, g.hod, COALESCE(obs.o, 0) AS o
    FROM (SELECT et.event_type, h.hod
          FROM (SELECT DISTINCT event_type FROM obs) et
          CROSS JOIN (SELECT DISTINCT hod FROM obs) h) g
    LEFT JOIN obs ON obs.event_type = g.event_type AND obs.hod = g.hod
),
rows_m AS (SELECT event_type AS et, SUM(o) AS n_r FROM cells GROUP BY 1),
cols_m AS (SELECT hod AS h, SUM(o) AS n_c FROM cells GROUP BY 1),
tot AS (
    SELECT SUM(o) AS n, COUNT(DISTINCT event_type) AS r,
           COUNT(DISTINCT hod) AS c
    FROM cells
),
scored AS (
    SELECT t.n, t.r, t.c,
           CAST(FLOOR({float(CHI2_SCALE)!r}
                      * (CAST(ce.o * t.n - rm.n_r * cm.n_c AS DOUBLE)
                         * CAST(ce.o * t.n - rm.n_r * cm.n_c AS DOUBLE)
                         / (CAST(rm.n_r * cm.n_c AS DOUBLE)
                            * CAST(t.n AS DOUBLE)))) AS BIGINT) AS t_u
    FROM cells ce
    JOIN rows_m rm ON rm.et = ce.event_type
    JOIN cols_m cm ON cm.h = ce.hod
    CROSS JOIN tot t
),
agg AS (
    SELECT n, r, c, SUM(t_u) AS chi2_u, COUNT(*) AS n_cells
    FROM scored GROUP BY 1, 2, 3
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(CAST(chi2_u AS DOUBLE) / {CHI2_SCALE}, 4) AS chi2,
       ROUND(sqrt((CAST(chi2_u AS DOUBLE) / {CHI2_SCALE})
                  / (CAST(n AS DOUBLE) * (LEAST(r, c) - 1))), 6)
           AS cramers_v
FROM agg
"""


# -- trailing distinct-user window --------------------------------------------

DAU_WINDOW_H = 24


def events_trailing_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct active users per hour (sliding DAU): for
    every hour with traffic, how many DISTINCT users appeared in the
    (hour−23 … hour] window — the growth metric a dashboard slides
    hourly. COUNT(DISTINCT) over a sliding window is not a native window
    aggregate in either engine, so both spell it as the hour-grid ×
    in-window (hour, user) range join over the DEDUPLICATED per-hour
    user set.

    Scale: NOT the grid × (hour, user) range join the oracle spells (a
    nested-loop of |hours| × |hour-user| rows plus a 24× pair expansion
    — measured superlinear: 0.8 s at sf0.1 but 55 s on the ×100 replica,
    69× wall for 100× data). Instead, exact INTERVAL COVERAGE: a user
    active at hour h is counted in window starts g ∈ [h, h+23], so merge
    each user's active hours into maximal covered runs (a new run starts
    when the gap to the previous active hour exceeds 23 h — coverage of
    consecutive in-run hours overlaps, so a run covers exactly
    [first, last+23]), emit ±1 boundary markers per run, and prefix-sum
    the markers over the hour axis. Per-user work is bounded by CALENDAR
    hours (≤ |hours| rows per user — no hot-user skew possible), marker
    aggregation is |hours|-sized, and the prefix-sum window runs over the
    ~calendar-sized marker frame. Measured ×100: 55 s → ~4 s, now
    dominated by the unavoidable (hour, user) dedup. Adjacent runs
    (gap exactly 24 h) stay exact: the −1/+1 markers land on the same
    hour and cancel in the aggregate. The oracle keeps the range-join
    spelling as the semantic definition — the hash match proves the
    interval algorithm equal."""
    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(
        ts_s(F.date_trunc("hour", F.col("ts"))).alias("h"), "user_id"
    ).distinct()
    w_user = Window.partitionBy("user_id").orderBy("h")
    horizon = (DAU_WINDOW_H - 1) * 3600
    runs = (
        hu.withColumn(
            "new_run",
            F.when(
                F.col("h") - F.lag("h").over(w_user) > horizon, 1
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("new_run").over(
                w_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "run_id")
        .agg(F.min("h").alias("a"), F.max("h").alias("b"))
    )
    markers = runs.select(F.col("a").alias("h"), F.lit(1).alias("d")).unionByName(
        runs.select(
            (F.col("b") + DAU_WINDOW_H * 3600).alias("h"), F.lit(-1).alias("d")
        )
    )
    grid = hu.select("h").distinct().withColumn("d", F.lit(0))
    # the prefix sum must see marker hours that are not grid hours (run
    # ends land 24 h after traffic), so union before the cumsum and keep
    # only traffic hours at the end
    covered = (
        markers.unionByName(grid)
        .groupBy("h")
        .agg(F.sum("d").alias("d"))
        .withColumn(
            "dau",
            F.sum("d").over(
                Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        covered.join(grid.select("h"), "h", "left_semi")
        .select(F.col("h").alias("hour_start"), F.col("dau").cast("long").alias("dau_24h"))
        .orderBy("hour_start")
    )


EVENTS_TRAILING_DAU_ORACLE = f"""
WITH hu AS (
    SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
           user_id
    FROM events
),
grid AS (SELECT DISTINCT h FROM hu)
SELECT g.h AS hour_start,
       CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS dau_24h
FROM grid g
JOIN hu w
  ON w.h <= g.h AND w.h > g.h - {DAU_WINDOW_H} * 3600
GROUP BY 1
ORDER BY hour_start
"""


# -- revenue concentration (Lorenz/Gini) ----------------------------------------


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration: exact Gini coefficient via the
    ranked form (2Σi·xᵢ)/(nΣx) − (n+1)/n plus the top-1% / top-10%
    revenue shares — the whale-dependence summary behind pricing and
    risk reviews (and, swapped onto token counts per document, the
    corpus-concentration diagnostic).

    All inputs are exact: revenue in integer cents, ranks from a
    deterministic (revenue, custkey) total order, Σi·xᵢ in int64 (rank ≤
    |customers|, so the product stays ≪ 2^63 up to ~10⁷ customers —
    beyond that, bucket the Lorenz curve like doc_length_percentiles).
    The global rank window runs over the ALREADY-REDUCED per-customer
    frame (one row per customer), which is the documented trade: exact
    Gini needs a total order; at extreme cardinality use quantile-binned
    Lorenz points instead."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy(F.col("cents"), F.col("cust"))
    ranked = (
        per.withColumn("i", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint")
        )
    )
    return (
        ranked.agg(
            F.max("n").alias("n_customers"),
            F.sum("cents").alias("t"),
            F.sum(F.col("i") * F.col("cents")).alias("ix"),
            F.sum(
                F.when(
                    F.col("i") > F.expr("(n * 99) DIV 100"), F.col("cents")
                ).otherwise(0)
            ).alias("top1_cents"),
            F.sum(
                F.when(
                    F.col("i") > F.expr("(n * 9) DIV 10"), F.col("cents")
                ).otherwise(0)
            ).alias("top10_cents"),
        )
        .select(
            "n_customers",
            F.round(F.col("t") / 100.0, 2).alias("total_revenue"),
            F.round(
                (F.lit(2.0) * F.col("ix"))
                / (F.col("n_customers").cast("double") * F.col("t"))
                - (F.col("n_customers") + 1).cast("double")
                / F.col("n_customers"),
                6,
            ).alias("gini"),
            F.round(F.col("top1_cents").cast("double") / F.col("t"), 6).alias(
                "top1_share"
            ),
            F.round(
                F.col("top10_cents").cast("double") / F.col("t"), 6
            ).alias("top10_share"),
        )
    )


REVENUE_CONCENTRATION_ORACLE = """
WITH per AS (
    SELECT o_custkey AS cust,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT cents,
           ROW_NUMBER() OVER (ORDER BY cents, cust) AS i,
           COUNT(*) OVER () AS n
    FROM per
),
agg AS (
    SELECT MAX(n) AS n_customers,
           SUM(cents) AS t,
           SUM(i * cents) AS ix,
           SUM(CASE WHEN i > (n * 99) // 100 THEN cents ELSE 0 END)
               AS top1_cents,
           SUM(CASE WHEN i > (n * 9) // 10 THEN cents ELSE 0 END)
               AS top10_cents
    FROM ranked
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       ROUND(t / 100.0, 2) AS total_revenue,
       ROUND((2.0 * ix) / (CAST(n_customers AS DOUBLE) * t)
             - CAST(n_customers + 1 AS DOUBLE) / n_customers, 6) AS gini,
       ROUND(CAST(top1_cents AS DOUBLE) / t, 6) AS top1_share,
       ROUND(CAST(top10_cents AS DOUBLE) / t, 6) AS top10_share
FROM agg
"""


# -- k-core decomposition --------------------------------------------------------

KCORE_K = 3
# peel-round CEILING, not a fixed count: the kernel stops at the first
# fixpoint (measured: sf0.001 and sf0.01 both converge by round 11; the
# old fixed 6 honestly reported converged=false at sf0.01 — r5 verdict
# item 5). 16 leaves headroom; at 100 TB densities that still truncate,
# the rounds_used/converged columns say so.
KCORE_ROUNDS_MAX = 16


def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the co-purchase graph (same support-≥2
    edges as ``triangle_count``): synchronously peel nodes of degree
    < 3 for six rounds and report the surviving core with each node's
    within-core degree — the sixth graph kernel (after PageRank, CC,
    triangles, LPA communities, link prediction), and the standard
    "dense enough to matter" filter before any expensive per-node
    computation (spam rings, recommendation cores).

    The peel is DATA-ADAPTIVE with a fixed ceiling: peel until the edge
    set stops shrinking (the fixpoint — a synchronous peel only ever
    removes, so a stable edge COUNT is a stable edge SET) or
    ``KCORE_ROUNDS_MAX`` rounds, whichever first. Both engines replay
    the identical trajectory because rounds past the fixpoint are the
    identity: the oracle unrolls exactly ROUNDS_MAX rounds
    (MATERIALIZED CTEs) and derives ``rounds_used`` as the first round
    whose count matches its predecessor — the same number the kernel's
    early-stop observes. The ``rounds_used``/``converged`` columns make
    truncation OBSERVABLE: at gate scales the peel converges
    (rounds_used ≤ 11, converged=true, pinned by test); at a 100 TB
    density that outruns the ceiling a caller reads converged=false
    instead of trusting a small-scale test. Plan per round: one degree
    aggregate + two semi-joins, all on (src, dst) pairs;
    ``localCheckpoint`` each round truncates the lineage exactly like
    the CC loop, and the fixpoint check reuses that materialization (a
    count on a checkpointed frame). At 100 TB: peeling is the textbook
    distributed k-core (Montresor et al.), linear per round in
    surviving edges."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        _basket_pairs(li)
        .filter(F.col("n") >= TRIANGLE_MIN_COUNT)
        .select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        .localCheckpoint()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return kcore_peel(edges, KCORE_K, KCORE_ROUNDS_MAX)


def kcore_peel(edges: DataFrame, k: int, rounds_max: int) -> DataFrame:
    """Adaptive synchronous k-core peel with the truncation self-report:
    peel until the edge set stops shrinking or ``rounds_max`` rounds,
    output rows carry ``rounds_used`` (rounds actually executed — the
    first whose edge count matched its predecessor, or the ceiling) and
    a global ``converged`` flag. Convergence is checkable from the
    FINAL state alone — the next peel is the identity iff no surviving
    node has within-core degree < k — so the report costs one
    broadcast-sized aggregate, no extra round; the per-round fixpoint
    check is a count on the already-checkpointed frame. When
    ``rounds_max`` truncates (peeling cascades one frontier per round,
    so a long-chain graph needs diameter/2 rounds), converged=false
    makes it observable in production instead of only in a gate-scale
    fixpoint test. ``edges`` must be the symmetric (src, dst)
    orientation."""
    # the fixpoint's edge count rides each checkpoint's own
    # materialization job via observe() (r11, r10 verdict item 7): one
    # Spark job per peel round where checkpoint + count paid two
    obs0 = Observation("kcore_n0")
    edges = edges.observe(
        obs0, F.count(F.lit(1)).alias("n")
    ).localCheckpoint()
    prev_cnt = obs0.get["n"]
    rounds_used = rounds_max
    for r in range(1, rounds_max + 1):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        obs = Observation(f"kcore_n{r}")
        edges = (
            edges.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        cnt = obs.get["n"]
        if cnt == prev_cnt:  # peel removed nothing: fixpoint reached
            rounds_used = r
            break
        prev_cnt = cnt
    core = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg_in_core")
    )
    return (
        core.crossJoin(
            F.broadcast(
                core.agg(
                    (F.min("deg_in_core") >= F.lit(k)).alias("converged")
                )
            )
        )
        .select(
            F.lit(k).cast("int").alias("core_k"),
            "v",
            "deg_in_core",
            F.lit(rounds_used).cast("int").alias("rounds_used"),
            "converged",
        )
        .orderBy("v")
    )


def kcore_membership_oracle() -> str:
    # AS MATERIALIZED on every round CTE: DuckDB 1.0 INLINES CTEs, and
    # e{r} is referenced twice by round r+1 (two semi-joins) — inlined,
    # the unrolling re-evaluates the whole chain 2^ROUNDS times
    # (measured 147 s at sf0.01; materialized: sub-second). Rounds past
    # the fixpoint are the identity, so the full ROUNDS_MAX unrolling
    # yields EXACTLY the adaptive kernel's final state, and rounds_used
    # is re-derived as the first round whose edge count matches its
    # predecessor (the kernel's early-stop observation) — COALESCE'd to
    # the ceiling when no round stabilizes.
    rounds = []
    prev = "e0"
    for r in range(1, KCORE_ROUNDS_MAX + 1):
        rounds.append(f"""
k{r} AS MATERIALIZED (
    SELECT src FROM {prev} GROUP BY src HAVING COUNT(*) >= {KCORE_K}
),
e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM {prev} e
    SEMI JOIN k{r} s ON s.src = e.src
    SEMI JOIN k{r} d ON d.src = e.dst
)""")
        prev = f"e{r}"
    cnts = "\nUNION ALL ".join(
        f"SELECT {r} AS r, COUNT(*) AS c FROM e{r}"
        for r in range(0, KCORE_ROUNDS_MAX + 1)
    )
    return f"""
WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM baskets a
    JOIN baskets b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {TRIANGLE_MIN_COUNT}
),
e0 AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
),
{','.join(rounds)},
cnts AS MATERIALIZED ({cnts}),
ru AS (
    SELECT CAST(COALESCE(MIN(cur.r), {KCORE_ROUNDS_MAX}) AS INTEGER)
           AS rounds_used
    FROM cnts cur JOIN cnts prv ON prv.r = cur.r - 1 AND prv.c = cur.c
),
core AS MATERIALIZED (
    SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg_in_core
    FROM {prev}
    GROUP BY src
),
conv AS (SELECT MIN(deg_in_core) >= {KCORE_K} AS converged FROM core)
SELECT CAST({KCORE_K} AS INTEGER) AS core_k, v, deg_in_core,
       ru.rounds_used, conv.converged
FROM core CROSS JOIN conv CROSS JOIN ru
ORDER BY v
"""


# -- user behavioral entropy ------------------------------------------------------

UBE_SCALE = 1_000_000


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: entropy of the user's event-type
    mix, the dominant type and its share, and a single-type flag — the
    bot/scraper screen (a crawler is all 'view', a click-farm all
    'click'; organic users mix) that feeds the same quality gates as the
    corpus-side ``source_lang_mix``.

    Identical exact-arithmetic spelling as the source mix: per-(user,
    type) counts, micro-floored c·ln(n/c) terms summed as int64, one
    division in the output; the dominant type is a row_number over the
    (count desc, type) total order. One shuffle to (user × type), then
    user-sized frames."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = ut.groupBy(F.col("user_id").alias("u")).agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    term = F.floor(
        F.lit(float(UBE_SCALE))
        * F.col("c")
        * F.log(F.col("n").cast("double") / F.col("c"))
    ).cast("bigint")
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    ranked = (
        ut.join(tot, ut.user_id == tot.u)
        .withColumn("h_u", term)
        .withColumn("rnk", F.row_number().over(w))
    )
    return (
        ranked.groupBy("user_id", "n", "n_types")
        .agg(
            F.sum("h_u").alias("h_sum"),
            F.max(F.when(F.col("rnk") == 1, F.col("event_type"))).alias(
                "top_type"
            ),
            F.max(F.when(F.col("rnk") == 1, F.col("c"))).alias("top_c"),
        )
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            "n_types",
            "top_type",
            F.round(F.col("top_c") / F.col("n"), 6).alias("top_share"),
            F.round(
                F.col("h_sum").cast("double") / (F.lit(UBE_SCALE) * F.col("n")),
                6,
            ).alias("type_entropy"),
            (F.col("n_types") == 1).alias("is_single_type"),
        )
        .orderBy("user_id")
    )


USER_BEHAVIOR_ENTROPY_ORACLE = f"""
WITH ut AS (
    SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
tot AS (
    SELECT user_id AS u, SUM(c) AS n, COUNT(*) AS n_types FROM ut GROUP BY 1
),
ranked AS (
    SELECT ut.user_id, ut.event_type, ut.c, t.n, t.n_types,
           CAST(FLOOR({float(UBE_SCALE)!r} * ut.c
                      * ln(CAST(t.n AS DOUBLE) / ut.c)) AS BIGINT) AS h_u,
           ROW_NUMBER() OVER (PARTITION BY ut.user_id
                              ORDER BY ut.c DESC, ut.event_type) AS rnk
    FROM ut JOIN tot t ON t.u = ut.user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       MAX(CASE WHEN rnk = 1 THEN event_type END) AS top_type,
       ROUND(CAST(MAX(CASE WHEN rnk = 1 THEN c END) AS DOUBLE) / n, 6)
           AS top_share,
       ROUND(CAST(SUM(h_u) AS DOUBLE) / ({UBE_SCALE} * n), 6)
           AS type_entropy,
       n_types = 1 AS is_single_type
FROM ranked
GROUP BY user_id, n, n_types
ORDER BY user_id
"""


# -- above-mean streaks ------------------------------------------------------------

STREAK_TOP = 20


def events_above_mean_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest sustained-load episodes: maximal runs of consecutive hours
    whose volume exceeds the series mean, ranked by length — the
    "how long do surges last" view that a single-hour anomaly flag
    (``events_hourly_anomalies``) cannot answer, and the capacity number
    an autoscaler's cooldown is tuned against.

    Above-mean is exact integer (n_hours·x > total); runs are the
    gaps-and-islands spelling (hour index minus the above-mean running
    count is constant within a run — the RAKE phrase trick on a time
    axis); the final rank orders by (length desc, start). Everything
    past the hourly rollup is |hours|-sized."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        ts_s(F.date_trunc("hour", F.col("ts"))).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = hourly.agg(
        F.sum("n_events").alias("t"), F.count(F.lit(1)).alias("nh")
    )
    w = Window.orderBy("hour_start")
    marked = (
        hourly.crossJoin(F.broadcast(tot))
        .withColumn("above", F.col("nh") * F.col("n_events") > F.col("t"))
        .withColumn("idx", F.row_number().over(w))
        .withColumn(
            "run",
            F.col("idx")
            - F.sum(F.when(F.col("above"), 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("above"))
    )
    return (
        marked.groupBy("run")
        .agg(
            F.min("hour_start").alias("streak_start"),
            F.count(F.lit(1)).alias("len_hours"),
            F.sum("n_events").alias("total_events"),
        )
        .select("streak_start", "len_hours", "total_events")
        .orderBy(F.col("len_hours").desc(), "streak_start")
        .limit(STREAK_TOP)
    )


EVENTS_ABOVE_MEAN_STREAKS_ORACLE = f"""
WITH hourly AS (
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
),
tot AS (SELECT SUM(n_events) AS t, COUNT(*) AS nh FROM hourly),
marked AS (
    SELECT hour_start, n_events,
           nh * n_events > t AS above,
           ROW_NUMBER() OVER (ORDER BY hour_start) AS idx,
           ROW_NUMBER() OVER (ORDER BY hour_start)
           - SUM(CASE WHEN nh * n_events > t THEN 1 ELSE 0 END)
                 OVER (ORDER BY hour_start
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
    FROM hourly CROSS JOIN tot
)
SELECT MIN(hour_start) AS streak_start,
       CAST(COUNT(*) AS BIGINT) AS len_hours,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM marked
WHERE above
GROUP BY run
ORDER BY len_hours DESC, streak_start
LIMIT {STREAK_TOP}
"""


# -- watermark late-arrival accounting ------------------------------------------

WATERMARK_CHOICES_S = [900, 3600, 21600]  # 15 min, 1 h, 6 h


def watermark_late_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from the data instead of folklore: replaying the
    stream in arrival order (event_id is the ingest sequence), an event
    is LATE for watermark W if its event time trails the running max
    event time seen so far by more than W — exactly the rows
    ``withWatermark(W)`` would drop. One row per candidate W (15 min,
    1 h, 6 h) with the drop count and share: the table you read before
    choosing the streaming twins' watermark.

    The running max over arrival order is a prefix maximum — associative,
    so it is computed TWO-LEVEL instead of as one global-order window
    (which is a single task sorting and scanning the whole stream;
    measured ×100: 15.5 s for 10 M rows): range-partition by event_id,
    take each partition's local running max, then lift it by the maximum
    over all EARLIER partitions (an exclusive prefix max over the
    |partitions|-sized summary, broadcast back). Every row's watermark is
    exact regardless of where the partition boundaries fall, so the
    result is identical to the sequential spelling the oracle keeps. The
    partitioned frame is localCheckpoint'd because spark_partition_id
    over a sampled range partitioner re-samples per execution (the
    value_quantile_ranks lesson) — the local-window branch and the
    summary branch must see the SAME assignment. Exact integer
    microseconds end to end; one division per output row."""
    ev = load_table(spark, sf_dir, "events")
    n_parts = shuffle_partitions(spark)
    parted = (
        ev.select("event_id", ts_us("ts").alias("t_us"))
        .repartitionByRange(n_parts, "event_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = Window.partitionBy("pid").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prefix = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pmax = (
        parted.groupBy("pid")
        .agg(F.max("t_us").alias("pm"))
        .withColumn("pre", F.max("pm").over(w_prefix))
    )
    base = (
        parted.withColumn("lwm", F.max("t_us").over(w_local))
        .join(F.broadcast(pmax.select("pid", "pre")), "pid")
        # greatest() skips NULLs, so partition 0 (no earlier partitions)
        # keeps its local running max unchanged
        .withColumn("wm_us", F.greatest(F.col("lwm"), F.col("pre")))
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for s in WATERMARK_CHOICES_S:
        aggs.append(
            F.sum(
                F.when(
                    F.col("t_us") < F.col("wm_us") - s * 1_000_000, 1
                ).otherwise(0)
            ).alias(f"late_{s}")
        )
    wide = base.agg(*aggs)
    legs = []
    for s in WATERMARK_CHOICES_S:
        legs.append(
            wide.select(
                F.lit(s).cast("bigint").alias("watermark_s"),
                "n_events",
                F.col(f"late_{s}").alias("n_late"),
                F.round(F.col(f"late_{s}") / F.col("n_events"), 6).alias(
                    "late_share"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("watermark_s")


WATERMARK_LATE_ARRIVALS_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT CAST({s} AS BIGINT) AS watermark_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN t_us < wm_us - CAST({s} AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       ROUND(CAST(SUM(CASE WHEN t_us < wm_us - CAST({s} AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
           AS late_share
FROM (
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
           MAX(CAST(epoch_us(ts) AS BIGINT))
               OVER (ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS wm_us
    FROM events
)
"""
    for s in WATERMARK_CHOICES_S
) + "\nORDER BY watermark_s"
