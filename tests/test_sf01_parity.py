"""Scale-up parity at sf0.1 (10x the driver's correctness gate).

The driver BENCHES at sf0.1, so parity evidence must exist at that SF
every round, not just sf0.001/sf0.01: scale-dependent determinism bugs
(window-frame ties, cast-rounding, decimal->double drift) only surface
here. Default-on for the bench's headline subset; the FULL 155-plan
registry sweep at sf0.1 stays opt-in via SPARK_GRAFT_SLOW=1 (it is the
verify skill's step 5).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

from aics_dask_utils_spark.plans import all_plans
from aics_dask_utils_spark.testing import duckdb_connection, run_plan_vs_oracle

SLOW = os.environ.get("SPARK_GRAFT_SLOW") == "1"
SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"

FULL = sorted(all_plans())
NON_HEADLINE = [n for n in FULL if n not in HEADLINE]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb_connection(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_plan_parity_at_sf01(spark, duck01, name):
    run_plan_vs_oracle(spark, name, SF01, con=duck01)


@pytest.mark.skipif(
    not SLOW, reason="set SPARK_GRAFT_SLOW=1 for the full registry at sf0.1"
)
@pytest.mark.parametrize("name", NON_HEADLINE)
def test_full_registry_parity_at_sf01(spark, duck01, name):
    run_plan_vs_oracle(spark, name, SF01, con=duck01)


@pytest.fixture(scope="module")
def duck001():
    con = duckdb_connection(SF001)
    yield con
    con.close()


@pytest.mark.skipif(
    not SLOW, reason="set SPARK_GRAFT_SLOW=1 for the full registry at sf0.01"
)
@pytest.mark.parametrize("name", FULL)
def test_full_registry_parity_at_driver_sf(spark, duck001, name):
    """sf0.01 is the DRIVER's correctness SF: the local default suite
    runs sf0.001 and the sweep above runs sf0.1, so without this sweep
    a plan could pass both yet fail the actual gate SF (round-1 lesson:
    representation skews are SF-dependent)."""
    run_plan_vs_oracle(spark, name, SF001, con=duck001)
