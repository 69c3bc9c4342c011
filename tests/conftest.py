from __future__ import annotations

import pytest

from dataflow_example_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dataflow-example-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
