from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF0 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_master_spark.session import get_spark

    spark = get_spark(app_name="etl_master_spark_tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0
