"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's plan registry
(``aics_dask_utils_spark/plans``): every registered plan becomes a
``queries()`` entry, and its DuckDB oracle (when SQL-expressible)
becomes the ``oracle_sql()`` entry. The registry enforces the
column-aliasing and determinism conventions the hash compare needs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aics_dask_utils_spark.plans import all_plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    plans = all_plans()
    return plans["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_plans().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_plans().items()
        if spec.oracle is not None
    }
