"""Differential test: every registered plan vs its DuckDB oracle.

This is the local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json):
run the Spark plan and the oracle SQL over the same parquet, canonicalize,
compare. Plans without an oracle get the driver's weaker rows-only check.
"""

import pytest

from aics_dask_utils_spark.plans import all_plans
from aics_dask_utils_spark.testing import run_plan_vs_oracle

PLAN_NAMES = sorted(all_plans())


@pytest.mark.parametrize("name", PLAN_NAMES)
def test_plan_matches_oracle(spark, sf_dir, duck, name):
    run_plan_vs_oracle(spark, name, sf_dir, con=duck)
