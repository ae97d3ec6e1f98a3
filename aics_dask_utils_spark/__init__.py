"""aics_dask_utils_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``AllenCellModeling/aics_dask_utils`` (reference: a Dask
``DistributedHandler`` providing map / batched_map / gather over local
threads or a cluster, see reference ``aics_dask_utils/distributed_handler.py``)
as an idiomatic Spark engine:

- :class:`SparkHandler` mirrors the reference handler contract
  (backend selection by address, map -> gather, bounded batching).
- ``plans`` holds the declared query inventory (SURVEY.md §2b) —
  relational, window, dedup, similarity, text, multimodal, streaming —
  each with a DuckDB oracle for differential testing.
- ``operators`` / ``functions`` / ``sources`` / ``streaming`` hold the
  reusable building blocks those plans compose.

Everything is DataFrame/Catalyst-first: logical plans are declared with
the PySpark DataFrame/SQL API; Python UDFs (Arrow-batched) appear only
where built-ins cannot express the semantics (arbitrary-callable maps,
multimodal decode).
"""

__version__ = "0.1.0"


def get_module_version() -> str:
    """Return the package version (reference parity:
    ``aics_dask_utils/__init__.py:11-15``)."""
    return __version__


from .handler import SparkHandler, DEFAULT_PARALLELISM_FACTOR  # noqa: E402,F401
from .session import get_spark, stop_spark  # noqa: E402,F401

__all__ = [
    "SparkHandler",
    "DEFAULT_PARALLELISM_FACTOR",
    "get_spark",
    "stop_spark",
    "get_module_version",
    "__version__",
]
