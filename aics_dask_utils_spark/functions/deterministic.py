"""Deterministic float aggregation.

Double-precision SUM is order-dependent; Spark's partial aggregation
order varies with partitioning, so ``sum(double)`` is not bit-stable
across runs or engines. For oracle-hashable results we sum in exact
decimal arithmetic (order-independent) and cast the final value back to
double — bit-identical on any engine that implements decimal correctly,
at any partition count. This matters doubly at 100 TB, where partial
aggregation trees are deep and the naive double sum drifts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 6, precision: int = 30) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6, precision: int = 30) -> Column:
    """Deterministic mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


def drounded(col: Column, ndigits: int = 6) -> Column:
    """Round an inherently order-sensitive float result (stddev/corr/…)
    to a tolerance where cross-engine low-bit drift disappears."""
    return F.round(col, ndigits)
