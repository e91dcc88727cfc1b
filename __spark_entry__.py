"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_master_spark``; this file is a thin
adapter over ``etl_master_spark.plans.registry``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable regardless of the driver's cwd
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_master_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

_SMOKE_SF = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's evaluation pipeline
    (HR/NDCG/MRR@{5,10} per domain, ``my_utils.py:82-152``) on sf0.001."""
    # the driver may construct the session itself; the nanos flag is
    # session-level, so set it defensively here too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from etl_master_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    from etl_master_spark.operators.ranking import eval_metrics

    return eval_metrics(spark, _SMOKE_SF, mode="test")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            from etl_master_spark.session import ensure_package_shipped

            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(ORACLES)
