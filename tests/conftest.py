from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from fusets_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("fusets-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
