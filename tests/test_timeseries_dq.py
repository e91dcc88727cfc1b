"""Seasonal decomposition, Theil–Sen trend, and the declarative DQ audit —
planted fixtures with hand-computable answers."""

from __future__ import annotations

import datetime as dt

from etl_master_spark.operators.analytics import (
    events_seasonal_decompose,
    theil_sen_revenue_trend,
)
from etl_master_spark.operators.warehouse import dq_violations_audit


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_seasonal_decompose_flat_plus_cycle(spark, tmp_path):
    """Volume = 5 + (1 if hour-of-day == 0 else 0) over 4 days: trend is
    flat at the daily mean, the hod-0 seasonal index is positive, others
    slightly negative, and residuals vanish (pattern is perfectly
    periodic). Only hours with a complete ±12h window appear."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(96):
        n = 5 + (1 if h % 24 == 0 else 0)
        for j in range(n):
            rows.append((t0 + dt.timedelta(hours=h, seconds=j), 1, "e"))
    _write_events(spark, str(tmp_path), rows)
    got = events_seasonal_decompose(spark, str(tmp_path)).collect()
    assert len(got) == 96 - 24  # 12 hours trimmed at each edge
    for r in got:
        hod = (r["hour_start"] // 3600) % 24
        # the 2x24 MA of a periodic series is the period mean everywhere
        assert abs(r["trend"] - (5 + 1 / 24)) < 1e-6, r
        if hod == 0:
            assert r["seasonal"] > 0.9
        else:
            assert -0.1 < r["seasonal"] < 0
        assert abs(r["residual"]) < 1e-6


def test_theil_sen_exact_linear_series(spark, tmp_path):
    """Revenue t dollars on day t: every pairwise slope is exactly 1, so
    median and quartiles are all 1.0."""
    base = dt.date(1992, 1, 1)
    rows = [
        (i, 1, f"{i}-URGENT"[:0] or "1-URGENT", float(i + 1),
         base + dt.timedelta(days=i))
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = theil_sen_revenue_trend(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == 45
    assert r["theil_sen_slope"] == 1.0
    assert r["slope_q1"] == 1.0 and r["slope_q3"] == 1.0


def test_dq_audit_counts_planted_violations(spark, tmp_path):
    """One bad quantity, one bad discount, one pre-order shipdate among
    clean rows — each rule counts exactly its plant."""
    li_rows = [
        (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", dt.date(1995, 1, 10)),
        (1, 2, 1, 2, -3.0, 100.0, 0.05, 0.0, "N", "O", dt.date(1995, 1, 11)),
        (2, 1, 1, 1, 10.0, 100.0, 0.5, 0.0, "N", "O", dt.date(1995, 2, 2)),
        (2, 2, 1, 2, 10.0, 100.0, 0.05, 0.0, "N", "O", dt.date(1994, 12, 25)),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [
            (1, 1, "1-URGENT", 100.0, dt.date(1995, 1, 1)),
            (2, 1, "9-BOGUS", -5.0, dt.date(1995, 1, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate date",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    _write_events(spark, str(tmp_path), [(dt.datetime(2024, 1, 1), 1, "e")])
    spark.createDataFrame(
        [(0, "ok text", "en", "s", 7), (1, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["rule"]: r for r in dq_violations_audit(spark, str(tmp_path)).collect()}
    assert got["quantity_in_range"]["n_violations"] == 1
    assert got["discount_in_range"]["n_violations"] == 1
    assert got["priority_in_enum"]["n_violations"] == 1
    assert got["totalprice_positive"]["n_violations"] == 1
    assert got["text_nonempty"]["n_violations"] == 1
    assert got["value_non_negative"]["n_violations"] == 0
    assert got["ship_after_order"]["n_violations"] == 1  # the 1994-12-25 line
    assert got["ship_after_order"]["n_rows"] == 4
    assert got["quantity_in_range"]["violation_share"] == 0.25


def test_trailing_dau_window(spark, tmp_path):
    """Users 1,2 in hour 0; user 3 in hour 1; user 1 again 30h later:
    DAU(h0)=2, DAU(h1)=3 (still sees h0), DAU(h30)=1 (window rolled)."""
    from etl_master_spark.operators.analytics import events_trailing_dau

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 1, "e"), (t0 + dt.timedelta(seconds=5), 2, "e"),
        (t0 + dt.timedelta(hours=1), 3, "e"),
        (t0 + dt.timedelta(hours=30), 1, "e"),
    ]
    spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (ts, u, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["hour_start"]: r["dau_24h"] for r in events_trailing_dau(spark, str(tmp_path)).collect()}
    vals = sorted(got.items())
    assert [v for _, v in vals] == [2, 3, 1]


def test_revenue_concentration_extremes(spark, tmp_path):
    """Equal revenues -> Gini 0 and top-10% share == 1/n when n=10 (one
    customer above the 90th rank)."""
    from etl_master_spark.operators.analytics import revenue_concentration

    spark.createDataFrame(
        [(i, i, "O", 100.0, dt.date(1995, 1, 1), "1-URGENT") for i in range(10)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = revenue_concentration(spark, str(tmp_path)).collect()[0]
    assert r["n_customers"] == 10
    assert r["gini"] == 0.0
    assert r["top10_share"] == 0.1
    assert r["total_revenue"] == 1000.0


def test_revenue_concentration_single_whale(spark, tmp_path):
    """9 customers at ~0 and one whale: Gini -> high, top1/top10 shares
    capture the whale exactly."""
    from etl_master_spark.operators.analytics import revenue_concentration

    rows = [(i, i, "O", 1.0, dt.date(1995, 1, 1), "1-URGENT") for i in range(9)]
    rows.append((9, 9, "O", 991.0, dt.date(1995, 1, 1), "1-URGENT"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = revenue_concentration(spark, str(tmp_path)).collect()[0]
    assert r["top10_share"] == 0.991
    assert r["gini"] > 0.85


def test_above_mean_streaks_planted(spark, tmp_path):
    """Counts [1,9,9,1,9,1]: mean = 5, so two streaks: length 2 at hour 1
    and length 1 at hour 4, ranked longest first."""
    from etl_master_spark.operators.analytics import events_above_mean_streaks

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate([1, 9, 9, 1, 9, 1]):
        for j in range(n):
            rows.append((t0 + dt.timedelta(hours=h, seconds=j), 1, "e"))
    _write_events(spark, str(tmp_path), rows)
    got = events_above_mean_streaks(spark, str(tmp_path)).collect()
    assert [(r["len_hours"], r["total_events"]) for r in got] == [(2, 18), (1, 9)]
    assert got[0]["streak_start"] == got[1]["streak_start"] - 3 * 3600


def test_user_behavior_entropy_flags_single_type(spark, tmp_path):
    """User 1 is all 'view' (entropy 0, flagged); user 2 mixes two types
    evenly (entropy = floor-scaled ln 2)."""
    import math

    from etl_master_spark.operators.analytics import user_behavior_entropy

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(seconds=i), 1, "view") for i in range(6)]
    rows += [(t0 + dt.timedelta(seconds=100 + i), 2, "click") for i in range(3)]
    rows += [(t0 + dt.timedelta(seconds=200 + i), 2, "purchase") for i in range(3)]
    _write_events(spark, str(tmp_path), rows)
    got = {r["user_id"]: r for r in user_behavior_entropy(spark, str(tmp_path)).collect()}
    assert got[1]["is_single_type"] is True
    assert got[1]["type_entropy"] == 0.0 and got[1]["top_share"] == 1.0
    h_u = 2 * math.floor(1e6 * 3 * math.log(2))
    assert got[2]["type_entropy"] == round(h_u / (1e6 * 6), 6)
    assert got[2]["top_type"] == "click"  # tie broken by type name
    assert got[2]["is_single_type"] is False


def test_watermark_late_arrival_census(spark, tmp_path):
    """Arrival order: t=0h, t=2h, then a straggler stamped t=0h30m (90min
    behind the running max): late for W=15min and W=1h, on time for
    W=6h."""
    from etl_master_spark.operators.analytics import watermark_late_arrivals

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 1, "e"),
        (t0 + dt.timedelta(hours=2), 1, "e"),
        (t0 + dt.timedelta(minutes=30), 1, "e"),  # arrives third
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {r["watermark_s"]: r for r in watermark_late_arrivals(spark, str(tmp_path)).collect()}
    assert got[900]["n_late"] == 1
    assert got[3600]["n_late"] == 1
    assert got[21600]["n_late"] == 0
    assert got[900]["late_share"] == round(1 / 3, 6)


def test_watermark_two_level_equals_sequential(spark, tmp_path):
    """The two-level prefix max must equal the sequential running max for
    EVERY partition-boundary placement. 200 rows over 32 range partitions
    is ~6 rows per partition, so boundaries fall inside every regime of
    the sawtooth arrival pattern: rising runs (max advances), plunges
    (the straggler's watermark comes from an EARLIER partition's prefix),
    and a long flat tail (whole partitions whose local max is below the
    global prefix). Expected counts come from a pure-Python replay."""
    from etl_master_spark.operators.analytics import (
        WATERMARK_CHOICES_S,
        watermark_late_arrivals,
    )

    t0 = dt.datetime(2024, 1, 1)
    ts = []
    for i in range(200):
        if i < 120:  # sawtooth: jump 2h forward, fall back 90 min
            ts.append(t0 + dt.timedelta(hours=2 * (i // 3), minutes=-90 * (i % 3 > 0), seconds=i))
        else:  # flat tail far behind the running max
            ts.append(t0 + dt.timedelta(minutes=i))
    _write_events(spark, str(tmp_path), [(t, 1, "e") for t in ts])

    expect = {}
    for w in WATERMARK_CHOICES_S:
        wm, late = None, 0
        for t in ts:  # event_id is arrival order by the fixture writer
            wm = t if wm is None or t > wm else wm
            late += (wm - t).total_seconds() > w
        expect[w] = late
    got = {
        r["watermark_s"]: r
        for r in watermark_late_arrivals(spark, str(tmp_path)).collect()
    }
    assert {w: got[w]["n_late"] for w in expect} == expect
    assert all(got[w]["n_events"] == 200 for w in expect)
