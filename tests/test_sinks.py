"""S2 compute-if-missing materialization + S3 append sink."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from etl_master_spark.operators.recsplit import splits_of
from etl_master_spark.sources.io import ratings
from etl_master_spark.sources.sinks import append_metrics, materialize_splits


def _success_mtime(path: str) -> float:
    return os.path.getmtime(os.path.join(path, "_SUCCESS"))


def test_materialize_splits_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "mat")
    s1, n1 = materialize_splits(spark, sf_dir, out)
    want = {
        (r["user_id"], r["item_id"], r["domain"], r["split"])
        for r in splits_of(ratings(spark, sf_dir)).collect()
    }
    got = {
        (r["user_id"], r["item_id"], r["domain"], r["split"]) for r in s1.collect()
    }
    assert got == want
    assert n1.groupBy().count().first()[0] > 0
    mt = _success_mtime(f"{out}/splits")
    s2, _ = materialize_splits(spark, sf_dir, out)  # second call: read-only
    assert _success_mtime(f"{out}/splits") == mt
    assert s2.count() == s1.count()


def test_append_metrics(spark, tmp_path):
    path = str(tmp_path / "metrics")
    m = spark.range(3).select(
        F.col("id").alias("epoch"), F.lit("hr").alias("metric"), F.lit(0.5).alias("value")
    )
    append_metrics(m, path)
    append_metrics(m, path)
    assert spark.read.parquet(path).count() == 6


def test_compact_parquet(spark, sf_dir, tmp_path):
    """Compaction must preserve content exactly, hit the file-count target,
    and honor the within-file sort."""
    from etl_master_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(64).write.parquet(src)  # simulate appender fragmentation
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_mb=512, sort_within_by=["ts"])
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n == 1  # sf0.001 events ≪ 512 MB

    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert back.select("event_id").subtract(ev.select("event_id")).count() == 0
    # per-file sort: ts non-decreasing inside the single output file
    # (ts_us, not CAST AS LONG: the raw read yields TIMESTAMP_NTZ, which
    # rejects numeric casts)
    from etl_master_spark.sources.io import ts_us

    ts = [r["t"] for r in back.select(ts_us("ts").alias("t")).collect()]
    assert ts == sorted(ts)


@pytest.mark.slow
def test_freeze_and_eval_fingerprint_invalidation(spark, tmp_path, monkeypatch):
    """freeze_and_eval's reuse gate: same fingerprint reuses the frozen
    parquet byte-stably; a changed fingerprint (a model hyperparameter
    change) or a missing _SUCCESS marker (torn write) re-freezes instead
    of serving stale scores."""
    import glob
    import os

    from etl_master_spark.operators import ranking

    monkeypatch.setattr(ranking, "FROZEN_EVAL_DIR", str(tmp_path / "fz"))

    def frames(score):
        sc = spark.createDataFrame(
            [(1, 10, "x", score)], "user_id long, item_id long, domain string, score double"
        )
        hold = spark.createDataFrame([(1, 10, "x")], "user_id long, item_id long, domain string")
        negs = spark.createDataFrame([(1, 11, "x")], "user_id long, item_id long, domain string")
        return sc, hold, negs

    sc, hold, negs = frames(0.9)
    ranking.freeze_and_eval(sc, hold, negs, "t", "/sf0.01", fingerprint="v1").collect()
    base = str(tmp_path / "fz" / "t" / "sf0.01")
    first = glob.glob(f"{base}/scores/*.parquet")

    # same fingerprint: frozen files untouched even with NEW (different) scores
    sc2, hold2, negs2 = frames(0.1)
    ranking.freeze_and_eval(sc2, hold2, negs2, "t", "/sf0.01", fingerprint="v1").collect()
    assert glob.glob(f"{base}/scores/*.parquet") == first

    # changed fingerprint: re-freeze (file set changes, new scores land)
    ranking.freeze_and_eval(sc2, hold2, negs2, "t", "/sf0.01", fingerprint="v2").collect()
    second = glob.glob(f"{base}/scores/*.parquet")
    assert second != first
    assert spark.read.parquet(f"{base}/scores").collect()[0]["score"] == 0.1

    # torn write: missing _SUCCESS forces a re-freeze even at same fingerprint
    os.remove(f"{base}/scores/_SUCCESS")
    ranking.freeze_and_eval(sc, hold, negs, "t", "/sf0.01", fingerprint="v2").collect()
    assert os.path.exists(f"{base}/scores/_SUCCESS")
    assert spark.read.parquet(f"{base}/scores").collect()[0]["score"] == 0.9


@pytest.mark.slow
def test_freeze_and_eval_empty_fingerprint_never_reuses(
    spark, tmp_path, monkeypatch
):
    """An empty fingerprint is a MISMATCH, not a bypass (r4 ADVICE): a
    caller that forgets the argument must re-freeze rather than silently
    serve whatever freeze happens to be on disk."""
    import glob

    from etl_master_spark.operators import ranking

    monkeypatch.setattr(ranking, "FROZEN_EVAL_DIR", str(tmp_path / "fz"))

    def frames(score):
        sc = spark.createDataFrame(
            [(1, 10, "x", score)],
            "user_id long, item_id long, domain string, score double",
        )
        hold = spark.createDataFrame(
            [(1, 10, "x")], "user_id long, item_id long, domain string"
        )
        negs = spark.createDataFrame(
            [(1, 11, "x")], "user_id long, item_id long, domain string"
        )
        return sc, hold, negs

    sc, hold, negs = frames(0.9)
    ranking.freeze_and_eval(sc, hold, negs, "t", "/sf0.01", fingerprint="v1").collect()
    base = str(tmp_path / "fz" / "t" / "sf0.01")
    first = glob.glob(f"{base}/scores/*.parquet")

    # default (empty) fingerprint: the stale v1 freeze must NOT be reused
    sc2, hold2, negs2 = frames(0.1)
    ranking.freeze_and_eval(sc2, hold2, negs2, "t", "/sf0.01").collect()
    assert glob.glob(f"{base}/scores/*.parquet") != first
    assert spark.read.parquet(f"{base}/scores").collect()[0]["score"] == 0.1
