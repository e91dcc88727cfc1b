"""Warehouse-maintenance operators — the table-lifecycle surface a
production lake runs daily: SCD2 history build, MERGE-style snapshot
upsert, referential-integrity audit, RFM segmentation.

SURVEY.md §2.8: absent from the reference (its only lifecycle op is the
pickle compute-if-missing cache, S2); these are the engine-level additions
that make the relational surface operable as a *warehouse*, not just a
query engine. All four are pure DataFrame compositions — no UDFs — and
each documents its 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import phash_frag
from ..sources.io import load_table


# -- SCD2 history build -------------------------------------------------------

def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream:
    collapse each user's consecutive same-event_type runs into validity
    intervals [valid_from, valid_to), open-ended (NULL) for the current
    state — the gaps-and-islands pattern every CDC→dimension pipeline runs.

    One window partition key (user_id — high-cardinality, parallel) serves
    all three passes: lag to flag changes, running sum to number islands,
    lead to close intervals; Catalyst chains them with a single exchange
    because the partitioning never changes. Ordering is (ts, event_id) —
    the same total-order spec as event_gaps, so duplicate timestamps
    cannot flap between engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(changed).over(w).alias("island"),
    )
    runs = islands.groupBy("user_id", "island", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "island")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    ).orderBy("user_id", "valid_from")


SCD2_USER_HISTORY_ORACLE = """
WITH islands AS (
    SELECT user_id, event_type, ts, event_id,
           SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
),
runs AS (
    SELECT user_id, island, event_type,
           MIN(ts) AS valid_from, COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, island, event_type
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, island) AS valid_to,
       n_events
FROM runs
ORDER BY user_id, valid_from
"""


# -- MERGE-style snapshot upsert ----------------------------------------------

def snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet tables: apply a CDC delta to a
    snapshot — matched keys take the delta row, unmatched delta keys
    insert, untouched snapshot rows pass through. Derived deterministically
    from events: snapshot = event_id % 4 ∈ {0,1}; delta = even event_ids
    with a bumped value — so % 4 == 0 exercises UPDATE and % 4 == 2
    exercises INSERT, and both branches are provably non-empty.

    The plan is the scale-correct MERGE spelling: delta ∪ (snapshot
    ⟕anti delta). The anti join is the only shuffle, keyed on the PK; in
    production the delta is ≪ the snapshot, so AQE broadcasts it and the
    snapshot pass-through never shuffles at all (at 100 TB you'd also
    partition both sides by PK range to rewrite only touched files)."""
    ev = load_table(spark, sf_dir, "events")
    snapshot = ev.filter(F.col("event_id") % 4 < 2).select(
        "event_id", "event_type", "value"
    )
    delta = (
        ev.filter(F.col("event_id") % 2 == 0)
        .select(
            "event_id",
            F.lit("updated").alias("event_type"),
            (F.col("value") + 1000.0).alias("value"),
        )
    )
    merged = delta.withColumn("op", F.lit("upsert")).unionByName(
        snapshot.join(delta, "event_id", "left_anti").withColumn(
            "op", F.lit("carry")
        )
    )
    # no output sort: per-row merged snapshot (event_gaps contract)
    return merged


SNAPSHOT_UPSERT_ORACLE = """
WITH snapshot AS (
    SELECT event_id, event_type, value FROM events WHERE event_id % 4 < 2
),
delta AS (
    SELECT event_id, 'updated' AS event_type, value + 1000.0 AS value
    FROM events WHERE event_id % 2 = 0
)
SELECT event_id, event_type, value, 'upsert' AS op FROM delta
UNION ALL
SELECT s.event_id, s.event_type, s.value, 'carry' AS op
FROM snapshot s
WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.event_id = s.event_id)
ORDER BY event_id
"""


# -- referential-integrity audit ----------------------------------------------

FK_EDGES = [
    # (child, fk_col, parent, pk_col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass referential-integrity report over the whole star schema:
    per FK edge, child row count and orphan count (child keys with no
    parent). The constraint check a lake without enforced FKs schedules
    after every load.

    Each edge is child ⟕anti parent — the dimension parents broadcast, so
    the two fact-side edges cost one scan each with no shuffle; the union
    of seven 1-row aggregates is driver-trivial. Anti-join (not NOT IN) is
    deliberate: NULL-safe and streamable at any parent size."""
    rows = []
    for child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[fk] == p[pk], "left_anti")
        rows.append(
            c.agg(F.count(F.lit(1)).alias("n_child_rows")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(
                F.lit(child).alias("child_table"),
                F.lit(fk).alias("fk_column"),
                F.lit(parent).alias("parent_table"),
                "n_child_rows",
                "n_orphans",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("child_table", "fk_column")


FK_INTEGRITY_AUDIT_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{child}' AS child_table, '{fk}' AS fk_column,
       '{parent}' AS parent_table,
       (SELECT COUNT(*) FROM {child}) AS n_child_rows,
       (SELECT COUNT(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})) AS n_orphans"""
    for child, fk, parent, pk in FK_EDGES
) + "\nORDER BY child_table, fk_column"


# -- RFM segmentation ---------------------------------------------------------

def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary quintile segmentation over the order
    history — the marketing-warehouse classic (and a three-window NTILE
    exercise with deterministic tie-breaks).

    One shuffle for the per-customer aggregate (PK-keyed, parallel), then
    three global NTILE windows. Monetary is summed in exact BIGINT cents so
    the quintile boundaries cannot shift on float summation order; every
    ORDER BY ends with c_custkey, making each NTILE assignment a total
    order. The three single-partition windows are the documented local-mode
    concession: at 100 TB you'd NTILE via approx quantile boundaries + a
    broadcast bucket join instead of a global sort (same swap as
    shipping_delay_stats documents)."""
    orders = load_table(spark, sf_dir, "orders")
    price_cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(price_cents).alias("monetary_cents"),
    )
    w_r = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    w_m = Window.orderBy(F.col("monetary_cents").desc(), F.col("o_custkey"))
    return (
        per_cust.select(
            F.col("o_custkey").alias("c_custkey"),
            "last_order",
            "frequency",
            (F.col("monetary_cents") / 100.0).alias("monetary"),
            F.ntile(5).over(w_r).alias("r_score"),
            F.ntile(5).over(w_f).alias("f_score"),
            F.ntile(5).over(w_m).alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws("-", F.col("r_score"), F.col("f_score"), F.col("m_score")),
        )
        .orderBy("c_custkey")
    )


CUSTOMER_RFM_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS frequency,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS monetary_cents
    FROM orders
    GROUP BY o_custkey
)
SELECT o_custkey AS c_custkey,
       last_order,
       frequency,
       monetary_cents / 100.0 AS monetary,
       NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
       NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
       NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score,
       CONCAT(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey), '-',
              NTILE(5) OVER (ORDER BY frequency DESC, o_custkey), '-',
              NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey)) AS segment
FROM per_cust
ORDER BY c_custkey
"""


# -- join-key skew audit -------------------------------------------------------

SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-join-key skew profile for the fact tables' hot join keys: key
    cardinality, multiplicity percentiles, the heaviest key's share, and
    max/mean skew factor — the planning audit that decides, BEFORE a
    100 TB join, which keys need AQE skew handling or salting (a
    max_mult ≫ p99_mult key concentrates one shuffle partition; top_share
    bounds the single-task fraction of the build side).

    Per key: one map-side-combined count aggregate (raw rows → |keys|),
    then one percentile aggregate over the multiplicities. Integer
    multiplicities make the interpolated percentiles exact in both
    engines; ratios divide exact integers once, in the output. The
    audited key list is static config, so the union is a fixed fan of
    independent scans — at 100 TB each leg is the cheapest possible
    full-scan summary of its table, and `approx_percentile` is the
    drop-in swap exactly as value_percentiles documents."""
    legs = []
    for tbl, key in SKEW_KEYS:
        counts = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("mult"))
        )
        legs.append(
            counts.agg(
                F.lit(tbl).alias("rel"),
                F.lit(key).alias("key_col"),
                F.sum("mult").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("mult").alias("max_mult"),
                F.expr("round(percentile(mult, 0.5), 6)").alias("p50_mult"),
                F.expr("round(percentile(mult, 0.99), 6)").alias("p99_mult"),
                F.round(F.max("mult") / F.sum("mult"), 6).alias("top_share"),
                F.round(
                    F.max("mult") * F.count(F.lit(1)) / F.sum("mult"), 6
                ).alias("skew_factor"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("rel", "key_col")


JOIN_SKEW_AUDIT_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{tbl}' AS rel, '{key}' AS key_col,
       CAST(SUM(mult) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(mult) AS BIGINT) AS max_mult,
       ROUND(quantile_cont(mult, 0.5), 6) AS p50_mult,
       ROUND(quantile_cont(mult, 0.99), 6) AS p99_mult,
       ROUND(CAST(MAX(mult) AS DOUBLE) / SUM(mult), 6) AS top_share,
       ROUND(CAST(MAX(mult) AS DOUBLE) * COUNT(*) / SUM(mult), 6)
           AS skew_factor
FROM (SELECT {key} AS k, COUNT(*) AS mult FROM {tbl} GROUP BY 1)
"""
    for tbl, key in SKEW_KEYS
) + "\nORDER BY rel, key_col"


# -- incremental aggregate refresh (IVM twin) ---------------------------------

IVM_CUTOFF = "1998-01-01"  # rows before = materialized base; after = delta


def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance for the monthly
    revenue-by-priority rollup: the pre-cutoff BASE aggregate (the state a
    warehouse would have materialized) is merged with the post-cutoff
    DELTA batch by re-aggregating the two partial states — never
    rescanning base facts. The oracle recomputes the rollup from ALL
    facts, so the hash gate IS the IVM correctness statement: merged
    partials ≡ full recompute (sums/counts are the self-maintainable
    aggregates; min/max/distinct would need auxiliary state).

    Money stays in exact 1e-2 integer units through every partial, so
    merge order cannot perturb values. At 100 TB the point is the cost
    model: refresh work is O(|delta| + |dirty groups|), not O(|base|) —
    the delta aggregate shuffles only the day's rows and the merge
    touches only group keys the delta produced plus the stored state."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def partial(df):
        return df.groupBy(
            month.alias("month"), F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("cents"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < F.lit(IVM_CUTOFF)))
    delta = partial(orders.filter(F.col("o_orderdate") >= F.lit(IVM_CUTOFF)))
    return (
        base.unionByName(delta)
        .groupBy("month", "priority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
        .select(
            "month",
            "priority",
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy("month", "priority")
    )


INCREMENTAL_AGG_REFRESH_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS revenue
FROM orders
GROUP BY 1, 2
ORDER BY month, priority
"""


# -- robust numeric-cleanup stats ---------------------------------------------

ROBUST_Z = 3.5  # the standard modified-z outlier cut (Iglewicz-Hoaglin)


def robust_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust numeric-quality profile per event type: median, MAD,
    p1/p99 winsorization bounds, and how many rows a |modified z| > 3.5
    cut or a p1/p99 clamp would touch — the outlier-handling decision
    table a feature pipeline computes before normalizing a raw value
    column (median/MAD resist the very outliers a mean/stddev gate would
    absorb).

    Two grouped percentile aggregates (the second for MAD needs |x −
    median| and so a join back of the |types|-row medians — broadcast),
    then one counting pass. Modified z uses the 0.6745·dev/MAD form; the
    comparison is written identically in both engines and rows with MAD=0
    count as non-outliers by construction. At 100 TB swap the exact
    percentile for ``approx_percentile`` (value_percentiles documents the
    trade) and the shape is three map-side-combined passes."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median"),
        F.expr("percentile(value, 0.01)").alias("p1"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "median",
        "p1",
        "p99",
        F.abs(F.col("value") - F.col("median")).alias("adev"),
    )
    mad = dev.groupBy(F.col("event_type").alias("et")).agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    z_out = (F.lit(0.6745) * F.col("adev")) > (F.lit(ROBUST_Z) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), dev.event_type == mad.et)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("median"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.round(F.max("p1"), 6).alias("p1"),
            F.round(F.max("p99"), 6).alias("p99"),
            F.sum(F.when(F.col("value") < F.col("p1"), 1).otherwise(0)).alias(
                "n_below_p1"
            ),
            F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0)).alias(
                "n_above_p99"
            ),
            F.sum(
                F.when((F.col("mad") > 0) & z_out, 1).otherwise(0)
            ).alias("n_robust_outliers"),
        )
        .orderBy("event_type")
    )


ROBUST_VALUE_STATS_ORACLE = f"""
WITH med AS (
    SELECT event_type,
           quantile_cont(value, 0.5) AS median,
           quantile_cont(value, 0.01) AS p1,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY 1
),
dev AS (
    SELECT e.event_type, e.value, m.median, m.p1, m.p99,
           ABS(e.value - m.median) AS adev
    FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
    SELECT event_type AS et, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY 1
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(d.median), 6) AS median,
       ROUND(MAX(m.mad), 6) AS mad,
       ROUND(MAX(d.p1), 6) AS p1,
       ROUND(MAX(d.p99), 6) AS p99,
       CAST(SUM(CASE WHEN d.value < d.p1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below_p1,
       CAST(SUM(CASE WHEN d.value > d.p99 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above_p99,
       CAST(SUM(CASE WHEN m.mad > 0
                      AND 0.6745 * d.adev > {ROBUST_Z} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_robust_outliers
FROM dev d JOIN mad m ON m.et = d.event_type
GROUP BY 1
ORDER BY event_type
"""


# -- block-jackknife confidence interval --------------------------------------

JK_BUCKETS = 32
JK_Z = 1.96


def jackknife_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife standard error and 95% CI for the mean
    order revenue: orders hash into 32 blocks, each block's leave-one-out
    mean comes from the complement totals, and the spread of the 32 LOO
    means gives SE² = (B−1)/B · Σ(m_b − m̄)² — the resampling-free
    uncertainty estimate a metrics pipeline attaches to a topline mean
    (valid under any within-block dependence; needs only partial sums).

    Engine-parity: money is exact integer cents; each LOO mean is one
    floor division (both engines floor positive DIV); deviations are the
    integer d_b = B·m_b − Σm (computed per row and THEN squared — the
    B²Σm² expansion would overflow int64, the deviation form stays
    ~1e14); the float chain (cast, sqrt, scale) is written identically in
    both engines.

    Scale: one map-side-combined aggregate to 32 partial rows, then
    constant work over block-count-sized frames — the TreeAggregate
    shape with the block count as the only driver-side state."""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.select(
            (F.expr(phash_frag("o_orderkey")) % JK_BUCKETS).alias("bkt"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n_b"), F.sum("cents").alias("c_b"))
        # 32 partial rows feeding three consumers (totals, LOO means,
        # deviations): checkpoint or each re-scans orders (4 scans -> 1)
        .localCheckpoint()
    )
    tot = per.agg(F.sum("n_b").alias("n"), F.sum("c_b").alias("t"))
    loo = per.crossJoin(F.broadcast(tot)).select(
        F.expr("CAST((t - c_b) DIV (n - n_b) AS BIGINT)").alias("m_b"),
        "n",
        "t",
    )
    jtot = loo.groupBy("n", "t").agg(
        F.count(F.lit(1)).alias("b"), F.sum("m_b").alias("s")
    )
    dev = loo.join(F.broadcast(jtot.select("b", "s")), how="cross").select(
        "n",
        "t",
        "b",
        (F.col("b") * F.col("m_b") - F.col("s")).alias("d"),
    )
    stats = dev.groupBy("n", "t", "b").agg(
        F.sum(F.col("d") * F.col("d")).alias("ss")
    )
    se = (
        F.sqrt(
            F.col("ss").cast("double")
            * (F.col("b") - 1)
            / F.col("b")
            / F.col("b")
            / F.col("b")
        )
        / 100.0
    )
    mean = F.col("t").cast("double") / F.col("n") / 100.0
    return stats.select(
        F.col("n").alias("n_orders"),
        F.col("b").alias("n_blocks"),
        F.round(mean, 4).alias("mean_revenue"),
        F.round(se, 4).alias("se_jack"),
        F.round(mean - JK_Z * se, 4).alias("ci_lo"),
        F.round(mean + JK_Z * se, 4).alias("ci_hi"),
    )


JACKKNIFE_REVENUE_CI_ORACLE = f"""
WITH per AS (
    SELECT ({phash_frag('o_orderkey')}) % {JK_BUCKETS} AS bkt,
           COUNT(*) AS n_b,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c_b
    FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n_b) AS n, SUM(c_b) AS t FROM per),
loo AS (
    SELECT CAST((t.t - p.c_b) // (t.n - p.n_b) AS BIGINT) AS m_b, t.n, t.t
    FROM per p CROSS JOIN tot t
),
jtot AS (SELECT COUNT(*) AS b, SUM(m_b) AS s FROM loo),
stats AS (
    SELECT l.n, l.t, j.b, SUM((j.b * l.m_b - j.s) * (j.b * l.m_b - j.s)) AS ss
    FROM loo l CROSS JOIN jtot j
    GROUP BY 1, 2, 3
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(b AS BIGINT) AS n_blocks,
       ROUND(CAST(t AS DOUBLE) / n / 100.0, 4) AS mean_revenue,
       ROUND(sqrt(CAST(ss AS DOUBLE) * (b - 1) / b / b / b) / 100.0, 4)
           AS se_jack,
       ROUND(CAST(t AS DOUBLE) / n / 100.0
             - {JK_Z} * sqrt(CAST(ss AS DOUBLE) * (b - 1) / b / b / b)
                       / 100.0, 4) AS ci_lo,
       ROUND(CAST(t AS DOUBLE) / n / 100.0
             + {JK_Z} * sqrt(CAST(ss AS DOUBLE) * (b - 1) / b / b / b)
                       / 100.0, 4) AS ci_hi
FROM stats
"""


# -- declarative data-quality audit -------------------------------------------

# (rule, relation, violation predicate — SQL valid in BOTH engines)
DQ_RULES = [
    ("quantity_in_range", "lineitem",
     "NOT (l_quantity >= 1 AND l_quantity <= 50)"),
    ("discount_in_range", "lineitem",
     "NOT (l_discount >= 0.0 AND l_discount <= 0.1)"),
    ("priority_in_enum", "orders",
     "o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM',"
     " '4-NOT SPECIFIED', '5-LOW')"),
    ("totalprice_positive", "orders", "NOT (o_totalprice > 0)"),
    ("value_non_negative", "events",
     "value IS NULL OR value < 0"),
    ("text_nonempty", "documents",
     "text IS NULL OR length(text) = 0"),
]


def dq_violations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Great-Expectations/dbt-test
    shape): each rule is a violation predicate evaluated as ONE
    conditional aggregate over its relation, plus the cross-table rule
    ship_after_order (a line must not ship before its order is placed —
    needs the orders join). Output is the per-rule violation census a
    pipeline gates ingestion on.

    The rule list is static config; single-table rules sharing a relation
    compile into one scan each (conditional sums side by side), and the
    predicates are written in the engine-portable SQL subset so the same
    strings drive Spark and the oracle. At 100 TB every leg is a
    map-side-combined scan; the join rule shuffles on orderkey once."""
    per_rel: dict[str, list] = {}
    for rule, rel, pred in DQ_RULES:
        per_rel.setdefault(rel, []).append((rule, pred))
    legs = []
    for rel, rules in per_rel.items():
        df = load_table(spark, sf_dir, rel)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(F.expr(pred), 1).otherwise(0)
                ).alias(f"v_{rule}")
                for rule, pred in rules
            ],
        )
        # one 1-row aggregate per relation; checkpoint it so the per-rule
        # union branches don't each re-scan the relation (8 scans -> 5)
        agg = agg.localCheckpoint()
        for rule, _ in rules:
            legs.append(
                agg.select(
                    F.lit(rule).alias("rule"),
                    F.lit(rel).alias("rel"),
                    "n_rows",
                    F.col(f"v_{rule}").alias("n_violations"),
                )
            )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
        ).alias("n_violations"),
    )
    legs.append(
        joined.select(
            F.lit("ship_after_order").alias("rule"),
            F.lit("lineitem⋈orders").alias("rel"),
            "n_rows",
            "n_violations",
        )
    )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "rule",
        "rel",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_share"
        ),
    ).orderBy("rule")


DQ_VIOLATIONS_AUDIT_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{rule}' AS rule, '{rel}' AS rel,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
       ROUND(CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS violation_share
FROM {rel}
"""
    for rule, rel, pred in DQ_RULES
) + """
UNION ALL
SELECT 'ship_after_order' AS rule, 'lineitem⋈orders' AS rel,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       ROUND(CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS violation_share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
ORDER BY rule
"""


# -- weight-of-evidence encoding ----------------------------------------------

WOE_LATE_DAYS = 60  # label: any line shipped > 60 days after order placement
WOE_SMOOTH = 0.5  # Haldane-Anscombe half-count keeps ln() finite on empty cells
WOE_SCALE = 1_000_000


def woe_priority_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence target encoding of order priority against the
    "shipped late" label (any line > 60 days after placement): per
    category WOE = ln(pos_share/neg_share) plus its information-value
    term — the leakage-resistant categorical encoding (and feature-power
    screen: IV < 0.02 ≈ useless, > 0.3 ≈ strong) a tabular-ML pipeline
    derives from exactly this query shape.

    The label needs one orderkey-grouped EXISTS over the lineitem join;
    category stats are then a |categories|-row aggregate. Engine-parity:
    counts are exact ints, shares use the ½-count smoothing so ln stays
    finite, and WOE/IV evaluate one identical float chain per category
    row (no cross-row float sums — IV is reported per category, its
    total being a trivial downstream sum)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.max(
                F.when(
                    F.datediff("l_shipdate", "o_orderdate") > WOE_LATE_DAYS, 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    lab = orders.join(
        late, orders.o_orderkey == late.ok, "left"
    ).select(
        "o_orderpriority",
        F.coalesce(F.col("is_late"), F.lit(0)).alias("is_late"),
    )
    cat = lab.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_late").alias("n_pos"),
    )
    tot = cat.agg(
        F.sum("n_pos").alias("t_pos"),
        F.sum(F.col("n") - F.col("n_pos")).alias("t_neg"),
    )
    ps = (F.col("n_pos") + WOE_SMOOTH) / (F.col("t_pos") + 2 * WOE_SMOOTH)
    ns = (F.col("n") - F.col("n_pos") + WOE_SMOOTH) / (
        F.col("t_neg") + 2 * WOE_SMOOTH
    )
    woe = F.log(ps / ns)
    return (
        cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            "n_pos",
            (F.col("n") - F.col("n_pos")).alias("n_neg"),
            F.round(woe, 6).alias("woe"),
            F.round((ps - ns) * woe, 6).alias("iv_term"),
        )
        .orderBy("category")
    )


WOE_PRIORITY_ENCODING_ORACLE = f"""
WITH late AS (
    SELECT l.l_orderkey AS ok,
           MAX(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate)
                         > {WOE_LATE_DAYS} THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
),
lab AS (
    SELECT o.o_orderpriority, COALESCE(late.is_late, 0) AS is_late
    FROM orders o LEFT JOIN late ON late.ok = o.o_orderkey
),
cat AS (
    SELECT o_orderpriority AS category, COUNT(*) AS n,
           SUM(is_late) AS n_pos
    FROM lab GROUP BY 1
),
tot AS (SELECT SUM(n_pos) AS t_pos, SUM(n - n_pos) AS t_neg FROM cat)
SELECT category,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n - n_pos AS BIGINT) AS n_neg,
       ROUND(ln(((n_pos + {WOE_SMOOTH}) / (t_pos + 2 * {WOE_SMOOTH}))
                / ((n - n_pos + {WOE_SMOOTH}) / (t_neg + 2 * {WOE_SMOOTH}))),
             6) AS woe,
       ROUND(((n_pos + {WOE_SMOOTH}) / (t_pos + 2 * {WOE_SMOOTH})
              - (n - n_pos + {WOE_SMOOTH}) / (t_neg + 2 * {WOE_SMOOTH}))
             * ln(((n_pos + {WOE_SMOOTH}) / (t_pos + 2 * {WOE_SMOOTH}))
                  / ((n - n_pos + {WOE_SMOOTH})
                     / (t_neg + 2 * {WOE_SMOOTH}))), 6) AS iv_term
FROM cat CROSS JOIN tot
ORDER BY category
"""


# -- deletion-cascade audit ----------------------------------------------------

CASCADE_SAMPLE_MOD = 100  # audit the ~1% of customers selected by hash


def deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten planning audit: for a deterministic ~1%
    hash-sample of customers, the full cascade footprint a deletion
    request would touch — their orders, the lineitems under those orders,
    and their click-stream events — the impact estimate a GDPR erasure
    job (or a tombstone-compaction planner) computes BEFORE mutating a
    100 TB lake.

    One semi-join chain along the FK paths (customer → orders →
    lineitem; customer → events by user id), each leg a count aggregate;
    the sampled key set rides broadcast. Exact integers end to end."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    sample = cust.filter(
        F.expr(phash_frag("c_custkey")) % CASCADE_SAMPLE_MOD == 0
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    s_orders = orders.join(
        F.broadcast(sample), orders.o_custkey == sample.c_custkey
    )
    n_cust = sample.agg(F.count(F.lit(1)).alias("n_customers"))
    n_ord = s_orders.agg(F.count(F.lit(1)).alias("n_orders"))
    n_li = li.join(
        s_orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).agg(F.count(F.lit(1)).alias("n_lineitems"))
    n_ev = ev.join(
        F.broadcast(sample), ev.user_id == sample.c_custkey
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        n_cust.crossJoin(n_ord)
        .crossJoin(n_li)
        .crossJoin(n_ev)
        .select(
            "n_customers",
            "n_orders",
            "n_lineitems",
            "n_events",
            (
                F.col("n_customers")
                + F.col("n_orders")
                + F.col("n_lineitems")
                + F.col("n_events")
            ).alias("n_rows_total"),
        )
    )


DELETION_CASCADE_AUDIT_ORACLE = f"""
WITH sample AS (
    SELECT c_custkey FROM customer
    WHERE ({phash_frag('c_custkey')}) % {CASCADE_SAMPLE_MOD} = 0
),
s_orders AS (
    SELECT o.o_orderkey FROM orders o
    JOIN sample s ON s.c_custkey = o.o_custkey
)
SELECT CAST((SELECT COUNT(*) FROM sample) AS BIGINT) AS n_customers,
       CAST((SELECT COUNT(*) FROM s_orders) AS BIGINT) AS n_orders,
       CAST((SELECT COUNT(*) FROM lineitem l
             JOIN s_orders so ON so.o_orderkey = l.l_orderkey) AS BIGINT)
           AS n_lineitems,
       CAST((SELECT COUNT(*) FROM events e
             JOIN sample s ON s.c_custkey = e.user_id) AS BIGINT) AS n_events,
       CAST((SELECT COUNT(*) FROM sample)
            + (SELECT COUNT(*) FROM s_orders)
            + (SELECT COUNT(*) FROM lineitem l
               JOIN s_orders so ON so.o_orderkey = l.l_orderkey)
            + (SELECT COUNT(*) FROM events e
               JOIN sample s ON s.c_custkey = e.user_id) AS BIGINT)
           AS n_rows_total
"""


# -- Kaplan-Meier shipping survival -------------------------------------------

KM_SCALE = 1_000_000  # micro-units for the log-space survival product


def shipping_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimate of the order-to-first-shipment delay with
    right-censoring: open orders (status 'O') are censored at their
    last observed delay, so the curve answers "what fraction of orders
    remains unshipped after t days" WITHOUT the bias of dropping
    in-flight orders — the survival-analysis shape behind SLA dashboards
    and churn curves alike.

    The cumulative KM product Π(1 − dᵢ/nᵢ) is evaluated in log space:
    each time point's ln((n−d)/n) is floored to integer micro-units, the
    ordered cumulative sum is exact int64, and exp() runs once per
    output row — a deterministic spelling of a running PRODUCT, which
    neither engine's windows support natively. The d = n boundary (the
    last at-risk group all failing) is an explicit flag → S = 0, not
    ln(0). Scale: orders reduce to one row each, then to |distinct
    delay| rows (~hundreds) before any window; the at-risk count is the
    suffix sum written as total − prefix + current."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.min(F.datediff("l_shipdate", "o_orderdate")).alias("delay"),
            F.max(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("censored"),
        )
    )
    times = per_order.groupBy("delay").agg(
        F.sum(F.when(F.col("censored") == 0, 1).otherwise(0)).alias("d"),
        F.sum("censored").alias("c"),
    )
    w = Window.orderBy("delay").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = times.agg(F.sum(F.col("d") + F.col("c")).alias("n_total"))
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
        F.floor(
            F.lit(float(KM_SCALE))
            * F.log(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk")
            )
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    scored = (
        times.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_at_risk",
            F.col("n_total")
            - F.sum(F.col("d") + F.col("c")).over(w)
            + F.col("d")
            + F.col("c"),
        )
        .withColumn("term_u", term)
        .withColumn("cum_u", F.sum("term_u").over(w))
        .withColumn(
            "hit_zero",
            F.max(
                F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)
            ).over(w),
        )
    )
    return scored.select(
        F.col("delay").alias("delay_days"),
        "n_at_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_u") / KM_SCALE), 6))
        .alias("survival"),
    ).orderBy("delay_days")


SHIPPING_SURVIVAL_CURVE_ORACLE = f"""
WITH per_order AS (
    SELECT l.l_orderkey,
           MIN(datediff('day', o.o_orderdate, l.l_shipdate)) AS delay,
           MAX(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
               AS censored
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
),
times AS (
    SELECT delay,
           SUM(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS d,
           SUM(censored) AS c
    FROM per_order GROUP BY 1
),
tot AS (SELECT SUM(d + c) AS n_total FROM times),
scored AS (
    SELECT delay, d, c,
           t.n_total
           - SUM(d + c) OVER (ORDER BY delay
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
           + d + c AS n_at_risk
    FROM times CROSS JOIN tot t
),
logs AS (
    SELECT delay, d, c, n_at_risk,
           CASE WHEN d > 0 AND d < n_at_risk
                THEN CAST(FLOOR({float(KM_SCALE)!r}
                          * ln(CAST(n_at_risk - d AS DOUBLE) / n_at_risk))
                     AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS term_u
    FROM scored
),
cum AS (
    SELECT delay, d, c, n_at_risk,
           SUM(term_u) OVER (ORDER BY delay
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_u,
           MAX(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY delay
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hit_zero
    FROM logs
)
SELECT delay AS delay_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(CAST(cum_u AS DOUBLE) / {KM_SCALE}), 6) END
           AS survival
FROM cum
ORDER BY delay_days
"""


# -- two-proportion A/B z-test -------------------------------------------------

AB_Z_CRIT = 1.96


def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between hash-split user cohorts on ATTRIBUTED
    conversion (a purchase within one hour of that user's click — the
    same as-of window ``purchase_click_attribution`` counts; raw
    has-a-purchase saturates at 100% on this stream and degenerates the
    test): the experiment-readout primitive every A/B platform computes,
    with the portable hash as the assignment function an experimentation
    system would use anyway.

    Conversions and cohort sizes are exact distinct counts; p̂s and the
    pooled z evaluate in one identical float chain on those ints, with
    an explicit NULL guard when the pooled rate is 0 or 1 (both engines
    would otherwise divide by zero). Scale: one bounded self-join per
    user's events (the attribution shape), one distinct-user aggregate,
    cohort-sized reduce."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts")
    )
    converted = (
        purchases.join(
            clicks,
            (purchases.user_id == F.col("cu"))
            & (F.col("c_ts") < F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    users = (
        ev.select("user_id")
        .distinct()
        .join(converted, "user_id", "left")
        .select(
            (F.expr(phash_frag("user_id")) % 2).alias("cohort"),
            F.coalesce(F.col("converted"), F.lit(0)).alias("converted"),
        )
    )
    stats = users.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    a = stats.filter(F.col("cohort") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = stats.filter(F.col("cohort") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    conv_t = F.col("conv_a") + F.col("conv_b")
    n_t = F.col("n_a") + F.col("n_b")
    p_pool = conv_t.cast("double") / n_t
    z = F.when(
        (conv_t > 0) & (conv_t < n_t),
        (p_a - p_b)
        / F.sqrt(
            p_pool
            * (1 - p_pool)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) > AB_Z_CRIT).alias("significant"),
    )


AB_CONVERSION_ZTEST_ORACLE = f"""
WITH converted AS (
    SELECT DISTINCT p.user_id
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
),
users AS (
    SELECT ({phash_frag('u.user_id')}) % 2 AS cohort,
           CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS converted
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN converted cv ON cv.user_id = u.user_id
),
stats AS (
    SELECT cohort, COUNT(*) AS n, SUM(converted) AS conv
    FROM users GROUP BY 1
),
ab AS (
    SELECT
        (SELECT n FROM stats WHERE cohort = 0) AS n_a,
        (SELECT n FROM stats WHERE cohort = 1) AS n_b,
        (SELECT conv FROM stats WHERE cohort = 0) AS conv_a,
        (SELECT conv FROM stats WHERE cohort = 1) AS conv_b
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a,
       CAST(conv_b AS BIGINT) AS conv_b,
       ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
       ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
       ROUND(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
             THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
             END, 4) AS z_stat,
       ABS(ROUND(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
             THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
             END, 4)) > {AB_Z_CRIT} AS significant
FROM ab
"""


# -- cohort LTV triangle --------------------------------------------------------


def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort lifetime-value triangle: customers cohorted by
    first-order month, revenue accumulated by months-since-acquisition —
    the (cohort × age) matrix every LTV model and payback analysis is
    fit on, emitted in long form with cohort sizes and cumulative
    revenue-per-customer.

    Month arithmetic is integer (12·year + month — no date subtraction
    ambiguity between engines); money is exact cents; the cumulative sum
    is a per-cohort ordered window over the triangle frame (|cohorts| ×
    |ages| rows). Two shuffles: the first-order argmin per customer and
    the (cohort, age) rollup."""
    orders = load_table(spark, sf_dir, "orders")
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    per = orders.select(
        "o_custkey",
        mnum.alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first = per.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    tri = (
        per.join(first, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age_m"))
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tri.join(F.broadcast(sizes), "cohort_m")
        .withColumn("cum_cents", F.sum("cents").over(w))
        .select(
            "cohort_m",
            "age_m",
            "n_customers",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            # half-up rounding in INTEGER space: cum/(100·n) is not a
            # finite decimal, so rounding the double at 4dp can land on a
            # genuine .00005 boundary and split the engines by one ULP
            (
                F.expr(
                    "CAST((cum_cents * 100 * 2 + n_customers)"
                    " DIV (2 * n_customers) AS BIGINT)"
                )
                / 10000.0
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort_m", "age_m")
    )


COHORT_LTV_TRIANGLE_ORACLE = """
WITH per AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
first AS (SELECT o_custkey, MIN(m) AS cohort_m FROM per GROUP BY 1),
sizes AS (
    SELECT cohort_m, COUNT(*) AS n_customers FROM first GROUP BY 1
),
tri AS (
    SELECT f.cohort_m, p.m - f.cohort_m AS age_m, SUM(p.cents) AS cents
    FROM per p JOIN first f ON f.o_custkey = p.o_custkey
    GROUP BY 1, 2
)
SELECT t.cohort_m AS cohort_m, t.age_m AS age_m,
       CAST(s.n_customers AS BIGINT) AS n_customers,
       ROUND(t.cents / 100.0, 2) AS revenue,
       ((SUM(t.cents) OVER (PARTITION BY t.cohort_m
                            ORDER BY t.age_m
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) * 100 * 2
         + s.n_customers) // (2 * s.n_customers)) / 10000.0
           AS cum_ltv_per_customer
FROM tri t JOIN sizes s ON s.cohort_m = t.cohort_m
ORDER BY t.cohort_m, t.age_m
"""


# -- Benford first-digit audit ---------------------------------------------------

BENFORD_SCALE = 1_000_000


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed leading
    digits of the cent amounts vs the log10(1 + 1/d) expectation, with
    per-digit micro-floored chi-square terms — the forensic screen that
    flags fabricated or clamped monetary data (a synthetic uniform price
    generator, like this one, fails it loudly and the statistic says by
    how much).

    The leading digit comes from the string form of the integer cents
    (identical in both engines; no float log tricks), expected counts
    are n·log10(1+1/d) evaluated in one identical float chain, and the
    chi-square sum is exact int64 over micro-floored terms. One grouped
    count; everything else is 9 rows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("d")
    ).groupBy("d").agg(F.count(F.lit(1)).alias("o"))
    tot = digits.agg(F.sum("o").alias("n"))
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    e = F.col("n") * exp_p
    dev = F.col("o") - e
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "o",
            F.round(exp_p, 6).alias("benford_p"),
            F.round(F.col("o") / F.col("n"), 6).alias("observed_p"),
            F.round(dev * dev / e, 4).alias("chi2_term"),
        )
        .orderBy("d")
    )


BENFORD_PRICE_AUDIT_ORACLE = """
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INTEGER) AS d,
           COUNT(*) AS o
    FROM orders GROUP BY 1
),
tot AS (SELECT SUM(o) AS n FROM digits)
SELECT d,
       CAST(o AS BIGINT) AS o,
       ROUND(log10(1.0 + 1.0 / d), 6) AS benford_p,
       ROUND(CAST(o AS DOUBLE) / n, 6) AS observed_p,
       ROUND((o - n * log10(1.0 + 1.0 / d))
             * (o - n * log10(1.0 + 1.0 / d))
             / (n * log10(1.0 + 1.0 / d)), 4) AS chi2_term
FROM digits CROSS JOIN tot
ORDER BY d
"""


# -- join-cardinality estimator audit -------------------------------------------

CARD_EST_JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
]


def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook join-cardinality estimation audited against truth: for
    each hot FK join, the System-R estimate |A|·|B| / max(ndv_A, ndv_B)
    (containment-of-values assumption) next to the EXACT join count and
    their ratio — the statistics feedback loop a cost-based optimizer
    runs; a ratio far from 1 on your own data is the signal to collect
    histograms before trusting any join reorder (companion to
    ``join_skew_audit``, which profiles the same keys' distribution).

    Each leg is two distinct-count aggregates plus one exact join count
    (the expensive truth — at 100 TB you'd sample it; the estimate side
    is scan-cheap, which is the operator's whole point). Integer inputs;
    the estimate's one division and the ratio round at the end."""
    legs = []
    for ta, ka, tb, kb in CARD_EST_JOINS:
        a = load_table(spark, sf_dir, ta)
        b = load_table(spark, sf_dir, tb)
        sa = a.agg(
            F.count(F.lit(1)).alias("n_a"),
            F.countDistinct(ka).alias("d_a"),
        )
        sb = b.agg(
            F.count(F.lit(1)).alias("n_b"),
            F.countDistinct(kb).alias("d_b"),
        )
        actual = a.join(b, a[ka] == b[kb]).agg(
            F.count(F.lit(1)).alias("actual")
        )
        est = (F.col("n_a") * F.col("n_b")).cast("double") / F.greatest(
            "d_a", "d_b"
        )
        legs.append(
            sa.crossJoin(F.broadcast(sb))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(f"{ta}.{ka}={tb}.{kb}").alias("join_key"),
                "n_a",
                "n_b",
                "d_a",
                "d_b",
                F.round(est, 2).alias("est_rows"),
                "actual",
                F.round(est / F.col("actual"), 4).alias("est_over_actual"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("join_key")


JOIN_CARDINALITY_ESTIMATE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{ta}.{ka}={tb}.{kb}' AS join_key,
       CAST((SELECT COUNT(*) FROM {ta}) AS BIGINT) AS n_a,
       CAST((SELECT COUNT(*) FROM {tb}) AS BIGINT) AS n_b,
       CAST((SELECT COUNT(DISTINCT {ka}) FROM {ta}) AS BIGINT) AS d_a,
       CAST((SELECT COUNT(DISTINCT {kb}) FROM {tb}) AS BIGINT) AS d_b,
       ROUND(CAST((SELECT COUNT(*) FROM {ta}) AS DOUBLE)
             * (SELECT COUNT(*) FROM {tb})
             / GREATEST((SELECT COUNT(DISTINCT {ka}) FROM {ta}),
                        (SELECT COUNT(DISTINCT {kb}) FROM {tb})), 2)
           AS est_rows,
       CAST((SELECT COUNT(*) FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb})
            AS BIGINT) AS actual,
       ROUND(CAST((SELECT COUNT(*) FROM {ta}) AS DOUBLE)
             * (SELECT COUNT(*) FROM {tb})
             / GREATEST((SELECT COUNT(DISTINCT {ka}) FROM {ta}),
                        (SELECT COUNT(DISTINCT {kb}) FROM {tb}))
             / (SELECT COUNT(*) FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb}),
             4) AS est_over_actual
"""
    for ta, ka, tb, kb in CARD_EST_JOINS
) + "\nORDER BY join_key"
