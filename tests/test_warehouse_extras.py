"""Incremental aggregate refresh (IVM partial-merge ≡ full recompute, in
Spark itself, independent of the DuckDB oracle) and robust median/MAD
cleanup stats on planted outliers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_master_spark.operators.warehouse import (
    incremental_agg_refresh,
    robust_value_stats,
)
from etl_master_spark.sources.io import load_table


def test_incremental_refresh_equals_full_recompute(spark, sf_dir):
    """The merged base⊕delta state must equal a single full aggregation —
    IVM's defining property — including groups on both sides of the
    cutoff."""
    got = incremental_agg_refresh(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    want = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
    )
    assert got.count() == want.count()
    assert (
        got.exceptAll(want.select("month", "priority", "n_orders", "revenue")).count()
        == 0
    )
    # the delta side is genuinely non-empty at this cutoff (1998 orders exist)
    assert (
        orders.filter(F.col("o_orderdate") >= "1998-01-01").count() > 0
    )


def _write_events_values(spark, path, rows):
    spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), 1, et, v, "{}")
            for i, (et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_robust_stats_flags_planted_outlier(spark, tmp_path):
    """99 values near 10 plus one at 1000: the spike exceeds both the p99
    clamp and the modified-z cut, and median/MAD ignore it."""
    rows = [("click", 10.0 + (i % 5)) for i in range(99)] + [("click", 1000.0)]
    _write_events_values(spark, str(tmp_path), rows)
    r = robust_value_stats(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 100
    assert 10.0 <= r["median"] <= 14.0
    assert r["mad"] <= 2.0
    assert r["n_above_p99"] == 1
    assert r["n_robust_outliers"] >= 1
    # the bulk is not flagged
    assert r["n_robust_outliers"] <= 5


def test_robust_stats_constant_column_is_quiet(spark, tmp_path):
    """A constant value column has MAD 0 -> zero robust outliers (the
    MAD=0 guard), zero clamp counts."""
    rows = [("view", 7.5)] * 50
    _write_events_values(spark, str(tmp_path), rows)
    r = robust_value_stats(spark, str(tmp_path)).collect()[0]
    assert r["mad"] == 0.0
    assert r["n_robust_outliers"] == 0
    assert r["n_below_p1"] == 0 and r["n_above_p99"] == 0


def test_woe_encoding_planted(spark, tmp_path):
    """Priority A: 2 late of 3; priority B: 0 late of 2. Hand-compute the
    smoothed WOE for A: ln((2.5/3)/(1.5/3)) and check the late label
    derives from the 60-day rule."""
    import math

    orders = [
        (1, 1, "A", 10.0, dt.date(1995, 1, 1)),
        (2, 1, "A", 10.0, dt.date(1995, 1, 1)),
        (3, 1, "A", 10.0, dt.date(1995, 1, 1)),
        (4, 1, "B", 10.0, dt.date(1995, 1, 1)),
        (5, 1, "B", 10.0, dt.date(1995, 1, 1)),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li = [
        (1, dt.date(1995, 3, 15)),  # 73 days -> late
        (2, dt.date(1995, 4, 1)),   # late
        (3, dt.date(1995, 1, 20)),  # on time
        (4, dt.date(1995, 1, 10)),
        (5, dt.date(1995, 2, 1)),
    ]
    spark.createDataFrame(
        [(ok, ok, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd) for ok, sd in li],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    from etl_master_spark.operators.warehouse import woe_priority_encoding

    got = {r["category"]: r for r in woe_priority_encoding(spark, str(tmp_path)).collect()}
    a, b = got["A"], got["B"]
    assert (a["n"], a["n_pos"], a["n_neg"]) == (3, 2, 1)
    assert (b["n"], b["n_pos"], b["n_neg"]) == (2, 0, 2)
    ps, ns = 2.5 / 3.0, 1.5 / 4.0
    assert a["woe"] == round(math.log(ps / ns), 6)
    assert a["iv_term"] == round((ps - ns) * math.log(ps / ns), 6)
    assert b["woe"] < 0  # never-late category scores negative


def test_deletion_cascade_consistency(spark, sf_dir):
    """Footprint legs recomputed independently in Spark must agree, and
    the sampled key set is the portable-hash 1%."""
    from etl_master_spark.functions.hashing import phash_py
    from etl_master_spark.operators.warehouse import (
        CASCADE_SAMPLE_MOD,
        deletion_cascade_audit,
    )

    r = deletion_cascade_audit(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    keys = {c["c_custkey"] for c in cust if phash_py(c["c_custkey"]) % CASCADE_SAMPLE_MOD == 0}
    assert r["n_customers"] == len(keys)
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey").collect()
    oks = {o["o_orderkey"] for o in orders if o["o_custkey"] in keys}
    assert r["n_orders"] == len(oks)
    assert r["n_rows_total"] == (
        r["n_customers"] + r["n_orders"] + r["n_lineitems"] + r["n_events"]
    )


def test_event_hour_independence_uniform_is_zero(spark, tmp_path):
    """A perfectly balanced type×hour table has chi2 exactly 0 and V 0."""
    from etl_master_spark.operators.analytics import event_hour_independence

    rows = []
    i = 0
    for h in range(4):
        for et in ("a", "b"):
            for _ in range(5):
                rows.append(
                    (i, dt.datetime(2024, 1, 1, h, 0, i % 60), 1, et, 1.0, "{}")
                )
                i += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = event_hour_independence(spark, str(tmp_path)).collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
    assert r["dof"] == 3 and r["n_cells"] == 8


def test_event_hour_independence_perfect_association(spark, tmp_path):
    """Type a only at hour 0, type b only at hour 1 -> Cramér's V = 1."""
    from etl_master_spark.operators.analytics import event_hour_independence

    rows = []
    i = 0
    for et, h in (("a", 0), ("b", 1)):
        for _ in range(10):
            rows.append(
                (i, dt.datetime(2024, 1, 1, h, 0, i % 60), 1, et, 1.0, "{}")
            )
            i += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = event_hour_independence(spark, str(tmp_path)).collect()[0]
    assert abs(r["cramers_v"] - 1.0) < 1e-5
    assert r["chi2"] == round(20.0, 4)  # chi2 == n for a 2x2 perfect split


def test_km_survival_matches_lifelines_style_hand_calc(spark, tmp_path):
    """4 orders, delays 1,1,2,3; the delay-2 order censored (status O):
    S(1) = 1 - 2/4 = 0.5 (micro-floored log-space), S(2) = S(1) (censored
    only), S(3) = 0 (last at-risk order fails -> hit_zero)."""
    import math

    from etl_master_spark.operators.warehouse import shipping_survival_curve

    orders = [
        (1, "F", dt.date(1995, 1, 1)),
        (2, "F", dt.date(1995, 1, 1)),
        (3, "O", dt.date(1995, 1, 1)),
        (4, "P", dt.date(1995, 1, 1)),
    ]
    spark.createDataFrame(
        [(ok, 1, st, 10.0, od, "1-URGENT") for ok, st, od in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    delays = {1: 1, 2: 1, 3: 2, 4: 3}
    spark.createDataFrame(
        [
            (ok, ok, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.date(1995, 1, 1) + dt.timedelta(days=dl))
            for ok, dl in delays.items()
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {r["delay_days"]: r for r in shipping_survival_curve(spark, str(tmp_path)).collect()}
    s1 = round(math.exp(math.floor(1e6 * math.log(2 / 4)) / 1e6), 6)
    assert got[1]["n_at_risk"] == 4 and got[1]["n_events"] == 2
    assert got[1]["survival"] == s1
    assert got[2]["n_censored"] == 1 and got[2]["survival"] == s1
    assert got[3]["n_at_risk"] == 1 and got[3]["survival"] == 0.0


def test_km_survival_monotone_on_real_data(spark, sf_dir):
    from etl_master_spark.operators.warehouse import shipping_survival_curve

    rows = shipping_survival_curve(spark, sf_dir).collect()
    surv = [r["survival"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert 0.0 <= surv[-1] <= surv[0] <= 1.0
    # at-risk counts strictly decrease
    ar = [r["n_at_risk"] for r in rows]
    assert all(a > b for a, b in zip(ar, ar[1:]))


def test_ab_ztest_planted_difference(spark, tmp_path):
    """Plant users whose cohort assignment is known from the hash: every
    cohort-0 user converts (click then purchase 10 min later), no
    cohort-1 user does -> z is large positive and flagged."""
    from etl_master_spark.functions.hashing import phash_py
    from etl_master_spark.operators.warehouse import ab_conversion_ztest

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for uid in range(1, 41):
        cohort = phash_py(uid) % 2
        rows.append((i, t0 + dt.timedelta(minutes=i), uid, "click", 1.0, "{}")); i += 1
        if cohort == 0:
            rows.append(
                (i, t0 + dt.timedelta(minutes=i - 1, seconds=600), uid,
                 "purchase", 1.0, "{}")
            ); i += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = ab_conversion_ztest(spark, str(tmp_path)).collect()[0]
    assert r["n_a"] + r["n_b"] == 40
    assert r["p_a"] == 1.0 and r["p_b"] == 0.0
    assert r["z_stat"] > 1.96
    assert r["significant"] is True


def test_cohort_ltv_planted(spark, tmp_path):
    """Two customers acquired in 1995-01 spending 100 then 50 in month 1;
    one customer acquired 1995-02 spending 200: cohort sizes 2/1, cum
    LTV per customer 50 -> 75 for the first cohort."""
    from etl_master_spark.operators.warehouse import cohort_ltv_triangle

    orders = [
        (1, 1, "O", 60.0, dt.date(1995, 1, 5)),
        (2, 2, "O", 40.0, dt.date(1995, 1, 20)),
        (3, 1, "O", 30.0, dt.date(1995, 2, 10)),
        (4, 2, "O", 20.0, dt.date(1995, 2, 11)),
        (5, 3, "O", 200.0, dt.date(1995, 2, 1)),
    ]
    spark.createDataFrame(
        [(ok, ck, st, tp, od, "1-URGENT") for ok, ck, st, tp, od in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        (r["cohort_m"], r["age_m"]): r
        for r in cohort_ltv_triangle(spark, str(tmp_path)).collect()
    }
    c1 = 1995 * 12 + 1
    assert got[(c1, 0)]["n_customers"] == 2
    assert got[(c1, 0)]["revenue"] == 100.0
    assert got[(c1, 0)]["cum_ltv_per_customer"] == 50.0
    assert got[(c1, 1)]["revenue"] == 50.0
    assert got[(c1, 1)]["cum_ltv_per_customer"] == 75.0
    assert got[(c1 + 1, 0)]["n_customers"] == 1
    assert got[(c1 + 1, 0)]["cum_ltv_per_customer"] == 200.0


def test_benford_terms_and_shares(spark, sf_dir):
    """Digits 1-9 all present on real data; Benford p sums to 1; observed
    shares sum to 1; chi2 terms are the hand formula."""
    import math

    from etl_master_spark.operators.warehouse import benford_price_audit

    rows = benford_price_audit(spark, sf_dir).collect()
    assert [r["d"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    n = sum(r["o"] for r in rows)
    r1 = rows[0]
    e = n * math.log10(2.0)
    assert abs(r1["chi2_term"] - round((r1["o"] - e) ** 2 / e, 4)) < 1e-3


def test_join_cardinality_estimate_fk_exactness(spark, sf_dir):
    """On a clean FK (every lineitem orderkey exists in orders, orders'
    key unique), the System-R estimate is EXACT: est == actual, ratio 1."""
    from etl_master_spark.operators.warehouse import join_cardinality_estimate

    rows = {r["join_key"]: r for r in join_cardinality_estimate(spark, sf_dir).collect()}
    li_o = rows["lineitem.l_orderkey=orders.o_orderkey"]
    assert li_o["d_b"] == li_o["n_b"]  # orders key is unique
    assert li_o["est_rows"] == float(li_o["actual"])
    assert li_o["est_over_actual"] == 1.0
    for r in rows.values():
        assert r["actual"] > 0 and r["est_rows"] > 0
