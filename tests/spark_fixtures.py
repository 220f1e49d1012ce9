"""Shared session-scoped SparkSession for the test suite."""

import pytest

from phonlp_spark.pipeline.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="phonlp_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
