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
