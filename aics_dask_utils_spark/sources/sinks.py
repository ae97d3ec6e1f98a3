"""Sinks (E5–E6).

``foreach_partition_sink`` is the Spark shape of the reference's
per-row PNG writer (``scripts/test_aics_cluster.py:98-101``): the
callable runs on executors, once per row, with partition-level batching —
no bytes are collected to the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Optional

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Hive-partitioned write — at 100 TB the partition columns are the
    coarse pruning axis for every later scan."""
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def foreach_partition_sink(
    df: DataFrame, row_sink: Callable, open_partition: Optional[Callable] = None
) -> None:
    """Per-row side-effecting sink. ``open_partition()`` (optional) builds
    per-partition state (e.g. a connection) once; ``row_sink(row, state)``
    or ``row_sink(row)`` handles each row on the executor."""

    if open_partition is None:
        def run(rows):
            for row in rows:
                row_sink(row)
    else:
        def run(rows):
            state = open_partition()
            for row in rows:
                row_sink(row, state)

    df.foreachPartition(run)
