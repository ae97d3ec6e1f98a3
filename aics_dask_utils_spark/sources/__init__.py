"""Sources & sinks (SURVEY §2b E1–E6).

Readers return plain DataFrames so every downstream operator benefits
from Catalyst pushdown — filters and projections reach the Parquet scan
(check ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from .readers import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
    read_csv,
    read_json,
    read_binary_files,
    from_sequences,
)
from .sinks import write_parquet, write_partitioned, foreach_partition_sink  # noqa: F401
