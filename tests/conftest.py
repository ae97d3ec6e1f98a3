import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aics_dask_utils_spark.session import get_spark  # noqa: E402
from aics_dask_utils_spark.testing import DEFAULT_SF_DIR, duckdb_connection  # noqa: E402

TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master=f"local[{TEST_CPUS}]",
        app_name="aics_dask_utils_spark-tests",
        shuffle_partitions=int(TEST_CPUS),
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return DEFAULT_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()
