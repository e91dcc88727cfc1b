"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each entry couples a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with its DuckDB oracle SQL (or None for genuinely non-SQL-expressible ops,
which the driver checks rows-only). Names track SURVEY.md §2 operator ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import ranking, recsplit

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# -- recsplit (E1-E5) --------------------------------------------------------
register(
    "cardinalities",
    recsplit.cardinalities,
    recsplit.CARDINALITIES_ORACLE,
)
register("splits_leave_two_out", recsplit.splits, recsplit.SPLITS_ORACLE)
register("negatives_sample", recsplit.negatives, recsplit.NEGATIVES_ORACLE)
register(
    "train_percent_sample",
    lambda spark, sf: recsplit.percent_sample(spark, sf, 0.5),
    recsplit.percent_sample_oracle(0.5),
)

# -- ranking / evaluation (R1-R7) -------------------------------------------
register(
    "topk_per_user",
    lambda spark, sf: ranking.topk_per_user(spark, sf, "test", 10),
    ranking.topk_oracle("test", 10),
)
register(
    "eval_metrics_test",
    lambda spark, sf: ranking.eval_metrics(spark, sf, "test"),
    ranking.eval_metrics_oracle("test"),
)
register(
    "eval_metrics_vali",
    lambda spark, sf: ranking.eval_metrics(spark, sf, "vali"),
    ranking.eval_metrics_oracle("vali"),
)
