"""The SCALE.md co-location claims, executed: bucketed joins plan without
exchanges; partition-key predicates prune at the directory level."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_master_spark.sources.io import load_table
from etl_master_spark.sources.sinks import write_bucketed_table, write_partitioned


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/wh'")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    agg = ev.groupBy("user_id").agg(F.sum("value").alias("total"))
    write_bucketed_table(ev, "bktdb.events_b", "user_id", 4)
    write_bucketed_table(agg, "bktdb.user_totals_b", "user_id", 4)
    # force the shuffle-join path so the assertion targets bucketing, not
    # broadcast (both are exchange-free, only one proves the bucket layout)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        prev_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bktdb.events_b").join(
            spark.table("bktdb.user_totals_b"), "user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join consumes the write-time bucketing: no runtime exchange
        assert "Exchange hashpartitioning" not in plan, plan
        want = ev.count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE bktdb.events_b")
    spark.sql("DROP TABLE bktdb.user_totals_b")


def test_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ev_part")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev.select("event_id", "user_id", "value", "event_type"), path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()
