"""Readers: parquet / csv / json / binary files / in-memory sequences.

E1–E4 of SURVEY §2b. The in-memory path (``from_sequences``) is the
schema-ful analogue of the reference's aligned-iterables table
(``distributed_handler.py:135-140``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

#: The driver test tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver table (E1).

    ``events.ts`` is INT64 TIMESTAMP(NANOS) in parquet, which Spark 4
    refuses to read natively — we read it as a long (legacy conf, set at
    runtime so any session works) and floor-convert to a µs timestamp,
    the same truncation DuckDB's ``CAST(ts AS TIMESTAMP)`` applies.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register the driver tables as temp views for the SQL entry point
    (E47). Idempotent; view name == table name (same names the DuckDB
    oracle pre-registers)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    """CSV scan (E2). Explicit schema preferred; inference only for
    exploration (inference is a full extra pass at 100 TB)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines scan (E2)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: Optional[str] = None
) -> DataFrame:
    """Binary/image scan (E3): one row per file with (path, modificationTime,
    length, content). The multimodal pipeline decodes ``content`` lazily in
    Arrow batches — bytes never touch the driver (reference image ETL,
    ``scripts/test_aics_cluster.py:89-101``)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def from_sequences(
    spark: SparkSession,
    *iterables: Sequence,
    names: Optional[Sequence[str]] = None,
    schema=None,
) -> DataFrame:
    """N aligned sequences -> N-column DataFrame (E4), the reference's
    multi-iterable zip (``distributed_handler.py:135-140``) as a table."""
    if not iterables:
        raise ValueError("need at least one sequence")
    lengths = {len(it) for it in iterables}
    if len(lengths) != 1:
        raise ValueError(f"sequences must be aligned; got lengths {sorted(lengths)}")
    rows = list(zip(*iterables))
    if schema is None:
        names = list(names) if names else [f"c{i}" for i in range(len(iterables))]
        return spark.createDataFrame(rows, names)
    return spark.createDataFrame(rows, schema)
