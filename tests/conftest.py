from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "4g")

from empujar_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("empujar-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def warehouse(spark, tmp_path):
    from empujar_spark.catalog import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))
