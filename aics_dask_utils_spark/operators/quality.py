"""Declarative data-quality constraint verification (Deequ-style).

The contract layer of a production table: a suite of named constraints
("text is >= 99% complete", "doc_id is unique", "n_chars within
bounds") evaluated in ONE pass and reported as a verdict table. The
design follows Amazon Deequ's published model (Schelter et al., VLDB
2018): every constraint reduces to a scalar METRIC computed by an
aggregate expression, and the verdict is a range predicate on the
metric — so an arbitrary number of checks shares a single scan with
map-side partials (count-distinct constraints add an Expand, still one
pass over the source).

All metrics here are ratios/extrema of exact integer counts (cast to
double at the end), so results are partition-count- and engine-
deterministic without decimal machinery. At 100 TB this is the cheap
gate you run on every ingest batch before publishing a partition.

The reference (a 196-line Dask map/gather wrapper) has no quality
surface; EXT capability of the pipeline north star (SURVEY §2b).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A constraint: (name, metric aggregate, inclusive lo, inclusive hi).
CheckSpec = tuple[str, Column, float, float]


def check_suite(df: DataFrame, checks: Sequence[CheckSpec]) -> DataFrame:
    """Evaluate all ``checks`` in one scan; one verdict row per check.

    Returns ``(check, metric, lo, hi, passed)`` in the order given.
    ``metric`` is the aggregate cast to double and rounded to 6 dp;
    ``passed`` is ``lo <= metric <= hi`` (NULL metric — e.g. min() of
    an empty table — fails closed: passed = false).
    """
    if not checks:
        raise ValueError("check_suite needs at least one check")
    one = df.agg(
        *[
            m.cast("double").alias(f"m{i}")
            for i, (_, m, _, _) in enumerate(checks)
        ]
    )
    structs = [
        F.struct(
            F.lit(name).alias("check"),
            F.round(F.col(f"m{i}"), 6).alias("metric"),
            F.lit(float(lo)).alias("lo"),
            F.lit(float(hi)).alias("hi"),
            F.coalesce(
                (F.col(f"m{i}") >= F.lit(float(lo)))
                & (F.col(f"m{i}") <= F.lit(float(hi))),
                F.lit(False),
            ).alias("passed"),
        )
        for i, (name, _, lo, hi) in enumerate(checks)
    ]
    return one.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def completeness(col: str) -> Column:
    """Fraction of rows with a non-NULL ``col`` (exact count ratio)."""
    return F.count(col) / F.count(F.lit(1))


def uniqueness(col: str) -> Column:
    """Distinct values of ``col`` over total rows (1.0 = unique key)."""
    return F.countDistinct(col) / F.count(F.lit(1))


def containment(col: str, allowed: Sequence[str]) -> Column:
    """Fraction of ALL rows whose ``col`` is inside the ``allowed``
    set. NULLs fail containment (denominator is COUNT(*), and a NULL
    never matches ``isin``) — the fail-closed reading a data-quality
    gate wants: a missing category is as much a violation as a wrong
    one. For non-NULL-relative semantics divide by ``F.count(col)``
    at the call site."""
    return F.sum(
        F.when(F.col(col).isin(*allowed), 1).otherwise(0)
    ) / F.count(F.lit(1))
