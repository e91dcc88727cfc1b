"""TPC-H remainder sweep — the query shapes not yet covered by
``relational.py`` (Q1/Q3/Q5/Q7/Q10/Q13/Q17/Q18 live there), adapted to the
driver's reduced star schema (no partsupp, no l_shipmode/commitdate/
receiptdate, no c_phone — each query notes its substitution).

SURVEY.md §2.8: the reference has none of these as such; they complete the
engine's general relational surface (correlated-min, EXISTS-driven counts,
scalar-subquery HAVING, disjunctive OR pushdown, nested dominance
subqueries, exists/not-exists self-joins, anti-join + global threshold).

Money follows the repo convention (see ``relational.nation_pair_trade``):
2-dp×2-dp products are exact 4-dp decimals, summed as BIGINT 1e-4 units and
half-up-divided to cents in integer space, so totals are order-independent
and engine-portable. Threshold comparisons are kept in integer space
(``value*1000 > total``) instead of float fractions for the same reason.

Scale notes per query; shared themes: dimensions broadcast, fact-side aggs
collapse map-side before any join outward, every literal predicate is
pushdown-eligible, group-by keys are either high-cardinality (parallel) or
fixed-size (tiny exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def _rev_e4() -> F.Column:
    """Exact discounted revenue in BIGINT 1e-4 units."""
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000, 0
    ).cast("long")


def _cents(col: str) -> F.Column:
    """Half-up 1e-4-units → dollars with 2dp, in integer space."""
    return F.expr(f"({col} + 50) div 100") / 100.0


# -- TPC-H Q2 flavor: minimum-cost supplier per part --------------------------

def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-min subquery shape: for each STANDARD-type part, the
    supplier(s) whose observed unit price (extendedprice/quantity — the
    partsupp supplycost substitute) is the part's minimum.

    Decorrelated as agg-then-self-join: per-part min is a map-side-combining
    agg on the part PK, then an equality join back at fact cardinality picks
    the achieving (part, supplier) pairs. Unit price stays a raw binary64
    quotient — both engines evaluate the identical IEEE expression, so the
    min and the equality join agree bit-for-bit (no summation, no rounding).
    Dimension joins (part filter, supplier, nation) all broadcast."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("p_partkey", "l_suppkey", unit)
    )
    best = offers.groupBy("p_partkey").agg(F.min("unit_price").alias("min_price"))
    return (
        offers.join(best, ["p_partkey"])
        .filter(F.col("unit_price") == F.col("min_price"))
        .select("p_partkey", "l_suppkey", "min_price")
        .distinct()
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round("min_price", 6).alias("unit_price"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


MIN_COST_SUPPLIER_ORACLE = """
WITH offers AS (
    SELECT p_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD'
),
best AS (
    SELECT p_partkey, MIN(unit_price) AS min_price FROM offers GROUP BY p_partkey
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       ROUND(min_price, 6) AS unit_price
FROM (
    SELECT DISTINCT o.p_partkey, o.l_suppkey, b.min_price
    FROM offers o JOIN best b ON o.p_partkey = b.p_partkey
    WHERE o.unit_price = b.min_price
)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey ASC
LIMIT 100
"""


# -- TPC-H Q4 flavor: priority counts of late-shipping orders -----------------

def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-driven count by priority: 1997 orders with at least one line
    shipped more than 90 days after the order date (the commitdate/
    receiptdate lateness test re-expressed with the columns we have).

    Spelled as a LEFT SEMI join with a non-equi conjunct — Spark keeps the
    equi part (orderkey) as the shuffle key and evaluates the date offset
    as a join residual, so it stays a hash semi-join, never a cartesian.
    The final group-by has 5 keys: pure map-side combine."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


LATE_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- TPC-H Q6 flavor: forecast revenue change ---------------------------------

def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-agg, no joins: revenue that discounts in the
    [0.05, 0.07] band would have yielded on small 1997 shipments. Every
    predicate reaches the parquet scan (PushedFilters prunes row groups on
    shipdate/quantity min-max); the agg is a single global reduce.
    extendedprice×discount is a 4-dp-exact product → BIGINT e4 sum."""
    li = load_table(spark, sf_dir, "lineitem")
    saved_e4 = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000, 0
    ).cast("long")
    return (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(saved_e4).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines"))
        .select(_cents("rev_e4").alias("revenue"), "n_lines")
    )


FORECAST_REVENUE_DELTA_ORACLE = """
SELECT ((SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) = 1997
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# -- TPC-H Q9 flavor: nation/year profit --------------------------------------

def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-profit roll-up: revenue minus a cost proxy (80% of
    p_retailprice per unit — the partsupp supplycost substitute), grouped
    by supplier nation × ship year.

    One fact-side pass: part + supplier + nation broadcast onto lineitem,
    amounts collapse map-side into a 25×~7-key group — the exchange carries
    kilobytes at any scale. qty (integer-valued) × 2-dp retail × 0.8 is a
    ≤3-dp-exact product, so BIGINT e4 units stay exact; the same literal
    expression order in both engines gives identical doubles pre-round."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost_e4 = F.round(
        F.col("l_quantity") * F.col("p_retailprice") * 0.8 * 10000, 0
    ).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(_rev_e4() - cost_e4).alias("profit_e4"))
        .select("nation", "o_year", _cents("profit_e4").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


NATION_YEAR_PROFIT_ORACLE = """
SELECT n_name AS nation,
       EXTRACT(year FROM l_shipdate) AS o_year,
       ((SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)
           - CAST(ROUND(l_quantity * p_retailprice * 0.8 * 10000, 0) AS BIGINT)) + 50) // 100) / 100.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# -- TPC-H Q11 flavor: important part values ----------------------------------

def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery HAVING: parts whose shipped value (qty × retail)
    exceeds 0.1% of the global shipped value.

    Per-part agg shuffles on the part PK (high-cardinality, parallel); the
    global total re-aggregates that result (tiny) rather than rescanning
    the fact, and broadcasts as a 1-row cross join. The threshold compares
    BIGINT×1000 against BIGINT — exact integer space, no float fraction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    value_e4 = F.round(
        F.col("l_quantity") * F.col("p_retailprice") * 10000, 0
    ).cast("long")
    per_part = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.sum(value_e4).alias("value_e4"))
    )
    total = per_part.agg(F.sum("value_e4").alias("total_e4"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_e4") * 1000 > F.col("total_e4"))
        .select("p_partkey", "p_name", _cents("value_e4").alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


IMPORTANT_PART_VALUES_ORACLE = """
WITH per_part AS (
    SELECT p_partkey, p_name,
           SUM(CAST(ROUND(l_quantity * p_retailprice * 10000, 0) AS BIGINT)) AS value_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
)
SELECT p_partkey, p_name, ((value_e4 + 50) // 100) / 100.0 AS part_value
FROM per_part
WHERE value_e4 * 1000 > (SELECT SUM(value_e4) FROM per_part)
ORDER BY part_value DESC, p_partkey ASC
"""


# -- TPC-H Q12 flavor: line-status priority classes ---------------------------

def line_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-CASE aggregation over a fact join (Q12's high/low
    priority split; l_linestatus stands in for the absent l_shipmode):
    1997 shipments classed by whether their order was urgent/high.

    The join shuffles on orderkey; the CASE sums combine map-side into a
    2-key result. The year filter prunes parquet row groups first."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


LINE_STATUS_PRIORITY_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM l_shipdate) = 1997
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# -- TPC-H Q14 flavor: promo revenue share ------------------------------------

def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-conditional-aggregates: the share of September-1997 revenue
    from PROMO-type parts. Part broadcasts; both sums ride one fact pass in
    exact e4 units; the final percentage is one BIGINT÷BIGINT binary64
    division (identical in both engines), rounded to 6dp."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1997) & (F.month("l_shipdate") == 9)
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("promo_e4"),
            F.sum(_rev_e4()).alias("total_e4"),
        )
        .select(
            _cents("promo_e4").alias("promo_revenue"),
            _cents("total_e4").alias("total_revenue"),
            F.round(
                F.lit(100.0) * F.col("promo_e4") / F.col("total_e4"), 6
            ).alias("promo_pct"),
        )
    )


PROMO_REVENUE_SHARE_ORACLE = """
WITH s AS (
    SELECT SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)
                    ELSE 0 END) AS promo_e4,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS total_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(year FROM l_shipdate) = 1997 AND EXTRACT(month FROM l_shipdate) = 9
)
SELECT ((promo_e4 + 50) // 100) / 100.0 AS promo_revenue,
       ((total_e4 + 50) // 100) / 100.0 AS total_revenue,
       ROUND(100.0 * promo_e4 / total_e4, 6) AS promo_pct
FROM s
"""


# -- TPC-H Q15 flavor: top supplier per quarter -------------------------------

def quarterly_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15's view-then-max shape: per-quarter supplier revenue, keep the
    supplier(s) achieving each quarter's maximum (ties kept, as in the
    spec).

    Agg-then-join twice: the (quarter, supplier) agg shuffles on a
    high-cardinality composite; the per-quarter max re-aggregates that
    small result and broadcasts back. Exact e4 revenue makes the equality
    join engine-portable — a double-sum max could disagree in the last ulp
    and drop/duplicate a tie."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    quarter = (
        F.date_trunc("quarter", F.col("l_shipdate")).cast("date").cast("string")
    )
    per_supp = (
        li.groupBy(quarter.alias("quarter"), "l_suppkey")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    best = per_supp.groupBy("quarter").agg(F.max("rev_e4").alias("best_e4"))
    return (
        per_supp.join(
            F.broadcast(best),
            (per_supp.quarter == best.quarter)
            & (per_supp.rev_e4 == best.best_e4),
        )
        .drop(best.quarter)
        .join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .select(
            "quarter",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            _cents("rev_e4").alias("total_revenue"),
        )
        .orderBy("quarter", F.col("s_suppkey").asc())
    )


QUARTERLY_TOP_SUPPLIER_ORACLE = """
WITH per_supp AS (
    SELECT CAST(CAST(date_trunc('quarter', l_shipdate) AS DATE) AS VARCHAR) AS quarter,
           l_suppkey,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS rev_e4
    FROM lineitem
    GROUP BY 1, 2
)
SELECT p.quarter, p.l_suppkey AS s_suppkey, s_name,
       ((p.rev_e4 + 50) // 100) / 100.0 AS total_revenue
FROM per_supp p
JOIN (SELECT quarter, MAX(rev_e4) AS best_e4 FROM per_supp GROUP BY quarter) b
  ON p.quarter = b.quarter AND p.rev_e4 = b.best_e4
JOIN supplier ON p.l_suppkey = s_suppkey
ORDER BY p.quarter, s_suppkey ASC
"""


# -- TPC-H Q16 flavor: supplier variety per part class ------------------------

def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN-subquery + COUNT(DISTINCT): how many distinct suppliers ship
    each (brand, type, size) class, excluding negative-balance suppliers
    (the 'customer complaints' exclusion re-expressed on s_acctbal) and one
    brand.

    The exclusion is a broadcast LEFT ANTI join (the excluded-supplier list
    is dimension-sized); part filters broadcast onto the fact; the distinct
    collapses (class, supplier) pairs before the final count — two shuffles
    totall, both on shrinking keys."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", F.col("p_size").asc()
        )
    )


SUPPLIER_VARIETY_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size ASC
"""


# -- TPC-H Q19 flavor: disjunctive bracket revenue ----------------------------

def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19's disjunction of conjunctive brackets — (brand, size-range,
    quantity-range) triples OR-ed together. Catalyst keeps the whole
    disjunction as one residual filter on the broadcast part join; the
    per-bracket quantity bounds are fact-side and pushdown-eligible as a
    derived OR range. Single global agg in exact e4 units."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((brand == "Brand#3") & size.between(1, 10) & qty.between(1, 20))
        | ((brand == "Brand#5") & size.between(11, 25) & qty.between(10, 30))
        | ((brand == "Brand#7") & size.between(26, 50) & qty.between(20, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(F.sum(_rev_e4()).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines"))
        .select(_cents("rev_e4").alias("revenue"), "n_lines")
    )


DISJUNCTIVE_BRACKET_REVENUE_ORACLE = """
SELECT ((SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


# -- TPC-H Q20 flavor: dominant part suppliers --------------------------------

def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested-dominance shape: suppliers who shipped more than half of
    some part's total 1997 volume (the availqty>half-demand test
    re-expressed on shipped quantities).

    (supplier, part) agg shuffles on the composite key; the per-part total
    re-aggregates that result (never rescans the fact); the dominance
    filter is a same-key join so AQE can plan it shuffle-free. Quantities
    are integer-valued doubles — sums < 2^53 stay exact, so the 2×
    comparison is portable. Output is the distinct dominant suppliers."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    totals = sp.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (
        sp.join(totals, ["l_partkey"])
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(supp, dominant.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name", F.col("s_suppkey").alias("suppkey"))
        .orderBy("s_name")
    )


DOMINANT_PART_SUPPLIERS_ORACLE = """
WITH sp AS (
    SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1997
    GROUP BY 1, 2
),
dominant AS (
    SELECT DISTINCT l_suppkey
    FROM sp JOIN (SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sp GROUP BY 1) t
      ON sp.l_partkey = t.l_partkey
    WHERE supp_qty * 2 > part_qty
)
SELECT s_name, n_name, s_suppkey AS suppkey
FROM dominant
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_name
"""


# -- TPC-H Q21 flavor: sole late supplier per stuck order ---------------------

def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's exists/not-exists double self-join, re-expressed as one
    grouped pass over the fact: for finished ('F') multi-supplier orders
    where EXACTLY ONE supplier shipped late (>60 days after order date),
    charge that supplier with the wait.

    The classic spelling joins lineitem to itself twice (EXISTS other-
    supplier line, NOT EXISTS other late line); at 100 TB those are two
    extra fact-scale shuffles. The grouped form computes per order: distinct
    suppliers, distinct late suppliers, and (via max of a conditional) THE
    late supplier — one shuffle on orderkey, then a supplier-keyed count.
    The oracle spells the same semantics; results are identical because
    'exactly one distinct late supplier' ⇒ max picks it deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SOLE_LATE_SUPPLIERS_ORACLE = """
WITH per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS n_late_supp,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey
)
SELECT s_name, n_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# -- TPC-H Q22 flavor: dormant wealthy customers by segment -------------------

def dormant_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-average threshold + anti-join (Q22 with c_mktsegment standing
    in for the phone country code): customers whose balance beats the
    average positive balance but who placed no order since 2000, counted
    and summed per market segment.

    The threshold is computed in exact integer cents (sum of rounded
    cents ÷ count — one binary64 division, portable) and broadcast as a
    1-row cross join; the no-recent-orders test is a LEFT ANTI join against
    the date-filtered orders (pushdown prunes the fact scan to post-2000
    row groups). Final agg: 5 segment keys, map-side."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    bal_cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal_cents) / F.count(F.lit(1))).alias("avg_cents")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(threshold))
        .filter(bal_cents > F.col("avg_cents"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(bal_cents).alias("bal_cents"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            (F.col("bal_cents") / 100.0).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


DORMANT_CUSTOMER_SEGMENTS_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0 AS total_balance
FROM customer
WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
  AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) > (
        SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) * 1.0 / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
