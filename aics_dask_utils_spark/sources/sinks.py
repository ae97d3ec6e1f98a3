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


def zorder_key(a, b, a_min: int, a_max: int, b_min: int, b_max: int, bits: int = 10):
    """Z-order (Morton) interleave of two integer columns, normalized to
    ``bits`` bits each via their global min/max — the multi-column
    clustering key behind lakehouse OPTIMIZE ZORDER BY: sorting by the
    interleaved key keeps rows close in BOTH dimensions close in the
    file order, so parquet row-group min/max stats prune scans filtered
    on either column (a single-column sort only prunes its own column).

    Pure integer bit arithmetic (floor-scale, shift, or) — identical on
    any engine, so the key itself sits under the oracle hash. Bounds
    are passed in (at scale: from table stats) to keep the expression a
    narrow per-row computation with no extra pass."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    def _norm(c, lo, hi):
        c = F.col(c) if not isinstance(c, Column) else c
        span = max(hi - lo, 1)
        scaled = ((c - lo) * ((1 << bits) - 1)) / span
        return F.floor(scaled).cast("bigint")

    na, nb = _norm(a, a_min, a_max), _norm(b, b_min, b_max)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(na, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(nb, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z
