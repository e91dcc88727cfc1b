"""Sketch-based scale twins must land within their error contracts of the
exact operators they replace at 100 TB."""

from __future__ import annotations

from collections import defaultdict

from etl_master_spark.operators.analytics import approx_profiles


def test_approx_profiles_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_master_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["nu"], r["ne"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct("event_id").alias("ne"),
        )
        .collect()
    }
    values = defaultdict(list)
    for r in ev.select("event_type", "value").collect():
        values[r["event_type"]].append(r["value"])
    for r in approx_profiles(spark, sf_dir).collect():
        nu, ne = exact[r["event_type"]]
        assert abs(r["approx_users"] - nu) <= max(3, 0.05 * nu)
        assert abs(r["approx_events"] - ne) <= max(3, 0.05 * ne)
        # the sketch contract is RANK error, not value error (heavy tails
        # make value-space bounds meaningless): the empirical rank of each
        # approximate percentile must sit within 2.5 points of its target
        vals = sorted(values[r["event_type"]])
        n = len(vals)
        for target, approx in zip((0.50, 0.90, 0.99), r["approx_pcts"]):
            rank = sum(v <= approx for v in vals) / n
            assert abs(rank - target) <= 0.025 + 1.0 / n, (target, rank)
