"""Salting helpers must be result-identical to their unsalted spellings."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_master_spark.functions.skew import salted_count_distinct, salted_join


def test_salted_join_equals_plain_join(spark):
    # zipfian hot key: key 0 carries half the rows
    hot = spark.range(2000).select(
        F.when(F.col("id") < 1000, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("attr")
    )
    want = sorted(tuple(r) for r in hot.join(dim, ["k"]).collect())
    got = sorted(tuple(r) for r in salted_join(hot, dim, ["k"]).collect())
    assert got == want


def test_salted_count_distinct_exact(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 417).alias("v")
    )
    want = {
        (r["g"], r["n"])
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {
        (r["g"], r["n_distinct"])
        for r in salted_count_distinct(df, "g", "v").collect()
    }
    assert got == want
