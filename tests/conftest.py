from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from rasusa_spark.session import get_spark

    s = get_spark("rasusa_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
