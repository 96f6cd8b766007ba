from __future__ import annotations

import pytest

from group5_spark.session import create_spark_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = create_spark_session("group5-tests", config_overrides={
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
