from __future__ import annotations

import pytest

from alp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="alp-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # tiny test data: AQE partition coalescing keeps stages snappy
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        },
    )
    yield s
    s.stop()
