from __future__ import annotations

import os

import pytest

# Default the differential suite to sf0.01 — the driver's real t2 scale.
# sf0.001 stays available as a quick smoke via KDIS_TEST_SF_DIR.
SF_SMOKE = os.environ.get("KDIS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from kafka_database_import_spark.session import EngineConfig, get_spark

    s = get_spark(EngineConfig(master="local[8]", shuffle_partitions=8))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
