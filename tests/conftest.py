from __future__ import annotations

import pytest

from bridgedownstream_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # default.parallelism=8: the suite builds hundreds of tiny
    # createDataFrame/mapInPandas jobs whose data fits one partition —
    # on local[32] each would otherwise schedule 32 (mostly empty) tasks,
    # pure scheduler overhead at test scale. Semantics are partition-
    # count-independent (the oracle gate runs the production 32).
    spark = get_spark(
        "bridgedownstream-tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield spark
