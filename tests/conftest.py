from __future__ import annotations

import pytest

from db_cdc_poc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="db-cdc-poc-spark-tests", cpus=4, shuffle_partitions=8)
    yield s
