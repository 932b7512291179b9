from __future__ import annotations

import pytest

from mie_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mie_spark_tests", master="local[4]")
    yield s
