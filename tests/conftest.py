from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests")
    yield s
    s.stop()
