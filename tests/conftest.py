from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from data_finder_comparator_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
