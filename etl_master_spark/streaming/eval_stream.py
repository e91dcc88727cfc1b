"""Incremental top-K ranking eval over a ratings stream (r6 verdict item 8).

The flagship batch eval (``ranking.eval_metrics``, reference
``my_utils.py:82-152``) scores each user's 100 candidates and
macro-averages HR/NDCG/MRR@K. This module maintains those metrics AS
RATING EVENTS ARRIVE: a ``foreachBatch`` loop that keeps per-(user,
domain) hit-rank state and appends one metrics row per (batch, domain,
K) — the monitoring table a training pipeline reads to watch eval
quality move with the data.

EXACTNESS, not approximation: after every micro-batch the emitted
metrics equal ``eval_metrics`` run in batch on the accumulated prefix
(test-pinned per-prefix, not just at the end). The work per batch is
bounded by the AFFECTED user set, not the corpus:

- a user's hit_rank depends on (a) their own item set (splits ->
  holdout + train, hash-sampled negatives) and (b) the popularity of
  their candidate items;
- (a) changes only for users TOUCHED by the batch;
- (b) changes only for items whose train-split count moved, and train
  splits move only for touched users — the per-item popularity deltas
  are computed from the touched users' old-vs-new splits and folded
  into an incrementally-maintained popularity state;
- users holding a delta'd item among their candidates re-score (the
  stored candidate-membership state finds them);
- a NEW ITEM in a domain's catalog reshuffles hash-sampled negatives
  for every user in that domain -> full-domain recompute for that batch
  (catalog growth is rare in steady state; the test covers it).

Global aggregates that stay O(prefix-scan) with tiny outputs (the
per-domain item universe) are recomputed per batch; the expensive
per-user machinery (collect_list shuffle, split/negative array ops,
candidate join, hit-rank windows) runs ONLY over affected users. At
100 TB the parquet state dirs become a real table format (Delta/Iceberg
MERGE) and the universe agg an incremental one; the dataflow is
unchanged.

State layout under ``work_dir`` (each epoch-versioned, last two kept,
so a replayed micro-batch deterministically rewrites its own epoch):
  prefix/eN   accumulated distinct ratings (user_id, item_id, domain)
  pop/eN      per-(domain, item) train popularity
  cand/eN     per-(user, domain) candidate membership (item_id, is_pos)
  hitrank/eN  per-(user, domain) hit_rank
  metrics/    append-only (batch_id, domain, k, n_users, hr, ndcg, mrr)
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import (
    DEFAULT_KS,
    hit_ranks,
    metrics_from_hit_ranks,
    score_candidates,
)
from ..operators.recsplit import (
    _shuffled_items,
    negatives_from_shuffled,
    splits_from_shuffled,
)

_UD = ["user_id", "domain"]


def _ratings_of(ev: DataFrame) -> DataFrame:
    """events -> distinct (user_id, item_id, domain); must mirror
    ``sources.io.ratings`` exactly (same regexp, same domain mapping)."""
    return (
        ev.select(
            "user_id",
            F.regexp_extract("props", r"([0-9]+)", 1)
            .cast("bigint")
            .alias("item_id"),
            F.when(F.col("event_type").isin("click", "view"), F.lit("x"))
            .otherwise(F.lit("y"))
            .alias("domain"),
        )
        .distinct()
    )


class _State:
    """Epoch-versioned parquet state dirs. Reads resolve the newest epoch;
    writes land in the batch's own epoch dir and prune everything older
    than the previous epoch (a foreachBatch replay of epoch N rebuilds
    N from N-1 deterministically)."""

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work = Path(work_dir)

    def _epochs(self, name: str) -> list[int]:
        base = self.work / name
        if not base.exists():
            return []
        return sorted(
            int(p.name[1:])
            for p in base.iterdir()
            if p.name.startswith("e") and p.name[1:].isdigit()
        )

    def read(self, name: str, epoch_lt: int) -> DataFrame | None:
        eps = [e for e in self._epochs(name) if e < epoch_lt]
        if not eps:
            return None
        return self.spark.read.parquet(str(self.work / name / f"e{eps[-1]}"))

    def write(self, name: str, epoch: int, df: DataFrame) -> DataFrame:
        path = self.work / name / f"e{epoch}"
        if path.exists():  # replayed micro-batch: rebuild deterministically
            shutil.rmtree(path)
        df.write.parquet(str(path))
        for e in self._epochs(name)[:-2]:  # keep this epoch + its parent
            shutil.rmtree(self.work / name / f"e{e}", ignore_errors=True)
        return self.spark.read.parquet(str(path))


def _universe(prefix: DataFrame) -> DataFrame:
    return prefix.groupBy("domain").agg(
        F.collect_set("item_id").alias("universe")
    )


def _train_counts(r: DataFrame) -> DataFrame:
    """(domain, item_id, n) over the train split of ``r``'s users."""
    return (
        splits_from_shuffled(_shuffled_items(r))
        .filter(F.col("split") == "train")
        .groupBy("domain", "item_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _recompute(
    prefix: DataFrame, affected: DataFrame, pop: DataFrame, mode: str
) -> tuple[DataFrame, DataFrame]:
    """(hit_rank rows, candidate-membership rows) for the affected users,
    scored against the GLOBAL popularity and item universe."""
    r_aff = prefix.join(affected, _UD)
    su = _shuffled_items(r_aff)
    sp = splits_from_shuffled(su)
    neg = negatives_from_shuffled(su, universe=_universe(prefix))
    pos = sp.filter(F.col("split") == mode).select(
        "user_id", "item_id", "domain", F.lit(1).alias("is_pos")
    )
    cand = neg.select(
        "user_id", "item_id", "domain", F.lit(0).alias("is_pos")
    ).unionByName(pos)
    scored = score_candidates(cand, pop)
    return hit_ranks(scored), cand.select("user_id", "domain", "item_id")


def _merge(old: DataFrame | None, affected: DataFrame, new: DataFrame) -> DataFrame:
    """Upsert: drop the affected users' old rows, union their new ones."""
    if old is None:
        return new
    return old.join(affected, _UD, "left_anti").unionByName(new)


def incremental_eval_metrics(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    work_dir: str,
    mode: str = "test",
    ks: list[int] | None = None,
    max_files_per_trigger: int = 1,
):
    """Start the incremental eval stream (availableNow); returns the
    streaming query — caller awaits, then reads metrics via
    ``read_metric_history``. ``stream_dir`` holds event-schema parquet
    files arriving over time; ``sf_dir`` supplies only the schema."""
    ks = ks or DEFAULT_KS
    state = _State(spark, work_dir)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        prefix_old = state.read("prefix", epoch_id + 1)
        ratings_b = _ratings_of(batch_df)
        if prefix_old is not None:
            new = ratings_b.join(
                prefix_old, ["user_id", "item_id", "domain"], "left_anti"
            ).cache()
            prefix_new = prefix_old.unionByName(new)
        else:
            new = ratings_b.cache()
            prefix_new = ratings_b
        prefix_new = state.write("prefix", epoch_id, prefix_new)

        cached = [new]
        touched = new.select(*_UD).distinct().cache()
        cached.append(touched)
        pop_old = state.read("pop", epoch_id + 1)
        cand_old = state.read("cand", epoch_id + 1)
        hit_old = state.read("hitrank", epoch_id + 1)

        if prefix_old is None or pop_old is None:
            # cold start: everyone is affected, popularity from scratch
            affected = prefix_new.select(*_UD).distinct()
            pop_new = _train_counts(prefix_new).withColumnRenamed("n", "pop")
        else:
            # popularity deltas from the touched users' split changes
            old_t = _train_counts(prefix_old.join(touched, _UD, "left_semi"))
            new_t = _train_counts(prefix_new.join(touched, _UD, "left_semi"))
            delta = (
                new_t.withColumnRenamed("n", "add")
                .join(
                    old_t.withColumnRenamed("n", "sub"),
                    ["domain", "item_id"],
                    "full_outer",
                )
                .select(
                    "domain",
                    "item_id",
                    (
                        F.coalesce("add", F.lit(0)) - F.coalesce("sub", F.lit(0))
                    ).alias("d"),
                )
                .filter(F.col("d") != 0)
                .cache()
            )
            cached.append(delta)
            pop_new = (
                pop_old.join(delta, ["domain", "item_id"], "full_outer")
                .select(
                    "domain",
                    "item_id",
                    (
                        F.coalesce("pop", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("pop"),
                )
                .filter(F.col("pop") > 0)
            )
            # users whose candidates include a delta'd item re-score
            from_pop = (
                cand_old.join(delta, ["domain", "item_id"], "left_semi")
                .select(*_UD)
                .distinct()
            )
            # catalog growth: hash-sampled negatives reshuffle domain-wide
            grown = (
                new.join(
                    _universe(prefix_old).select(
                        "domain", F.explode("universe").alias("item_id")
                    ),
                    ["domain", "item_id"],
                    "left_anti",
                )
                .select("domain")
                .distinct()
            )
            domain_users = prefix_new.join(grown, "domain", "left_semi").select(
                *_UD
            ).distinct()
            affected = touched.unionByName(from_pop).unionByName(
                domain_users
            ).distinct()

        pop_new = state.write("pop", epoch_id, pop_new)
        affected = affected.cache()
        cached.append(affected)
        hit_aff, cand_aff = _recompute(prefix_new, affected, pop_new, mode)
        hit_new = state.write(
            "hitrank", epoch_id, _merge(hit_old, affected, hit_aff)
        )
        state.write("cand", epoch_id, _merge(cand_old, affected, cand_aff))

        metrics_from_hit_ranks(hit_new, ks).withColumn(
            "batch_id", F.lit(epoch_id).cast("long")
        ).write.mode("append").parquet(str(Path(work_dir) / "metrics"))
        for df in cached:
            df.unpersist()

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(Path(work_dir) / "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_metric_history(spark: SparkSession, work_dir: str) -> DataFrame:
    """The appended metrics time series, one row per (batch, domain, K)."""
    return spark.read.parquet(str(Path(work_dir) / "metrics")).orderBy(
        "batch_id", "domain", "k"
    )
