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
    rows = approx_profiles(spark, sf_dir).collect()
    # long form: one row per (event_type, pct), sketch counts repeated
    assert len(rows) == 3 * len(exact)
    for r in rows:
        nu, ne = exact[r["event_type"]]
        assert abs(r["approx_users"] - nu) <= max(3, 0.05 * nu)
        assert abs(r["approx_events"] - ne) <= max(3, 0.05 * ne)
        # the sketch contract is RANK error, not value error (heavy tails
        # make value-space bounds meaningless): the empirical rank of each
        # approximate percentile must sit within 2.5 points of its target
        vals = sorted(values[r["event_type"]])
        n = len(vals)
        rank = sum(v <= r["approx_value"] for v in vals) / n
        assert abs(rank - r["pct"]) <= 0.025 + 1.0 / n, (r["pct"], rank)


def test_approx_profiles_audit_all_green(spark, sf_dir):
    from etl_master_spark.operators.analytics import approx_profiles_audit

    rows = approx_profiles_audit(spark, sf_dir).collect()
    assert rows, "audit produced no rows"
    for r in rows:
        assert r["n_events"] > 0
        for c in ("users_ok", "events_ok", "p50_ok", "p90_ok", "p99_ok"):
            assert r[c] is True, (r["event_type"], c)


def test_pca_whiten_audit_all_green(spark, sf_dir):
    from etl_master_spark.operators.vectors import pca_whiten_audit

    rows = pca_whiten_audit(spark, sf_dir).collect()
    assert [r["component"] for r in rows] == list(range(16))
    n_vecs = rows[0]["n_vectors"]
    assert n_vecs > 0
    for r in rows:
        assert r["n_vectors"] == n_vecs
        for c in ("mean_ok", "var_ok", "offdiag_ok", "ordered_ok"):
            assert r[c] is True, (r["component"], c)


def test_pca_whiten_long_form_is_scalar(spark, sf_dir):
    """The registered face must be driver-canonicalizable: every output
    column scalar-typed (pandas sort_values chokes on arrays)."""
    from etl_master_spark.operators.vectors import pca_whiten

    df = pca_whiten(spark, sf_dir)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "int", "double",
    ]
    pdf = df.limit(64).toPandas()
    pdf.sort_values(by=list(pdf.columns))  # the driver's exact crash site
