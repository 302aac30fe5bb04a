from __future__ import annotations

import pytest

from pylluminator_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pylluminator_spark_tests", shuffle_partitions=8)
    yield s
