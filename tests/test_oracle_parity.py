"""Every oracle-checked registry query must hash-match DuckDB at sf0.001 —
the in-repo twin of the driver's CORRECTNESS gate (fast; the driver runs
the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from etl_master_spark.plans.registry import ORACLES, QUERIES
from oracle_utils import duckdb_connect, compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    problems = compare(QUERIES[name](spark, SF), con, ORACLES[name])
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    if name == "als_eval_test":
        pytest.skip("ALS training covered by test_model")
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
