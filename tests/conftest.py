import os

import pytest

os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

from xdata_igraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xdata-igraph-spark-tests", cpus=4, shuffle_partitions=4)
    yield s
