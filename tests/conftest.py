from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from xgboost_ray_spark.session import get_spark

    # local[8,2]: 8 threads, maxFailures=2 — lets the fault-tolerance tests
    # exercise real task retries (the reference's kill-and-resume pattern).
    return get_spark(app_name="tests", master="local[8,2]", shuffle_partitions=8)
