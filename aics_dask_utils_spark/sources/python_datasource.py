"""Custom Python data source (E2 extensibility, Spark 4 DataSource API).

Spark 4 lets a connector be written in pure Python — schema, partition
planning, and per-partition reads — and registered like any built-in
format. This module ships a small but real one: a deterministic
synthetic-table source ("graftgen") that fans generation out across N
partitions, the connector-side twin of the reference's "turn Python
sequences into distributed work" surface
(``/root/reference/aics_dask_utils/distributed_handler.py:93-144``).

Scale notes (how a real connector should behave, demonstrated here):

- **partition planning is metadata-only**: ``partitions()`` returns one
  descriptor per split; no data is produced on the driver;
- **reads are executor-side and independent**: each ``read(partition)``
  generates only its own row range — the shape of a JDBC range reader,
  a Kafka offset-range reader, or a REST paginator;
- **deterministic content**: rows derive from the global row id, so the
  result is independent of the partition count (asserted in tests and
  the registered plan's oracle).

Registration is per-session: ``spark.dataSource.register(GraftGenSource)``,
then ``spark.read.format("graftgen").option(...).load()``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(i: int):
    """Deterministic row for global id ``i`` — pure function of ``i`` so
    any partitioning yields the same table."""
    label = ("alpha", "beta", "gamma", "delta", "epsilon")[i % 5]
    return (i, label, float(i) * 0.5, i * i % 97)


class GraftGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 4)))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class GraftGenSource(DataSource):
    """``spark.read.format("graftgen").option("n_rows", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "graftgen"

    def schema(self) -> str:
        return "id bigint, label string, score double, bucket bigint"

    def reader(self, schema) -> GraftGenReader:
        return GraftGenReader(self.options)


def register_graftgen(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(GraftGenSource)
