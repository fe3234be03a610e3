from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pgdedupe_spark import get_spark

    s = get_spark("pgdedupe-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running integration-scale gates (reference-parity scale); "
        "deselect with -m 'not slow' for the quick loop",
    )
