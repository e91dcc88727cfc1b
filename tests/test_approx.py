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


def test_approx_profiles_keeps_all_null_value_groups(spark, tmp_path):
    """A group whose `value` is entirely NULL has a NULL percentile array;
    posexplode_outer must keep that event type's row (NULL pct/approx_value)
    so its HLL distinct counts still surface — the inner explode silently
    dropped the whole group (r6 ADVICE)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(["2024-01-01"] * 6),
            "user_id": [1, 2, 3, 1, 2, 3],
            "event_type": ["click"] * 3 + ["ghost"] * 3,
            "value": [1.0, 2.0, 3.0, None, None, None],
            "props": ["{}"] * 6,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    rows = approx_profiles(spark, str(tmp_path)).collect()
    ghost = [r for r in rows if r["event_type"] == "ghost"]
    assert len(ghost) == 1, "all-NULL-value group must survive as one row"
    assert ghost[0]["pct"] is None and ghost[0]["approx_value"] is None
    assert ghost[0]["approx_users"] == 3 and ghost[0]["approx_events"] == 3
    assert len([r for r in rows if r["event_type"] == "click"]) == 3


def test_element_at_null_index_quirk(spark):
    """Engine pin: Spark 4.1.2's element_at with a RUNTIME-NULL index does
    not return NULL — it ignores the index's null flag and reads the
    uninitialized value slot (measured: the LAST array element when the
    NULL comes from an outer generate, 0 from a VALUES scan; constant-
    folded NULL indices behave correctly, which is why small probes miss
    it). F.get is the null-safe spelling approx_profiles relies on; if a
    Spark upgrade fixes element_at, this documents why get() was chosen."""
    from pyspark.sql import functions as F

    g = spark.sql("select cast(null as array<double>) as pv").select(
        F.posexplode_outer("pv").alias("pos", "v")
    )
    arr = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    [safe] = g.select(F.get(arr, F.col("pos")).alias("x")).collect()
    assert safe["x"] is None
    [quirk] = g.select(F.element_at(arr, F.col("pos") + 1).alias("x")).collect()
    # the buggy non-NULL result element_at gives today; if this starts
    # failing with x=None, Spark fixed SPARK-level null handling and the
    # pin (not the operator) should be updated
    assert quirk["x"] == 0.99


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
