"""Skew- and colocation-aware join strategies (the 100 TB toolbox).

Three tiers, cheapest first:

1. **AQE skew splitting** — on by default (`session.py`): skewed
   sort-merge partitions are split at runtime. Zero code. First resort.
2. **Salted join** (:func:`salted_join`) — when one join key is so hot
   a single key exceeds an executor (AQE splits partitions, not keys).
   The big side spreads each key over ``n_salts`` sub-keys by hashing a
   high-cardinality discriminator column; the small side is replicated
   ``n_salts`` times. Shuffle cost: big side unchanged, small side ×n.
3. **Bucketed co-located join** (:func:`write_bucketed` /
   :func:`bucketed_join_ready`) — for standing fact tables joined on
   the same key repeatedly: pay one bucketed write, then every
   subsequent sort-merge join on that key runs with NO exchange on
   either side (the scan itself is hash-distributed). At 100 TB this is
   the single biggest shuffle you can delete.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    discriminator: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted to break key skew.

    ``discriminator`` is any big-side column with spread within a key
    (row id, timestamp); the salt is ``pmod(hash(discriminator), n)`` —
    deterministic, so plans stay reproducible. The small side is
    exploded across all n salts. Result equals the plain join exactly
    (salt columns are internal)."""
    salt = F.pmod(F.hash(F.col(discriminator)), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    parquet table. Joins/aggregations on ``bucket_cols`` against any
    table bucketed the same way need no shuffle — and with ``sort_cols``
    no sort either."""
    # A table dir orphaned by a previous session (on-disk warehouse,
    # fresh in-memory catalog) makes CTAS fail with
    # LOCATION_ALREADY_EXISTS even in overwrite mode: drop the catalog
    # entry AND clear the leftover location first.
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (only
    ``spark.table`` keeps it; path-based reads lose the distribution)."""
    return spark.table(table)
