from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from zebra_spark.session import get_spark

    s = get_spark(
        master="local[4]",
        app_name="zs-tests",
        shuffle_partitions=8,
        rows_per_batch=1 << 12,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
