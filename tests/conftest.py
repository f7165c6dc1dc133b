from __future__ import annotations

import pytest

from bridgedownstream_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("bridgedownstream-tests", shuffle_partitions=8)
    yield spark
