"""The declared query inventory (SURVEY §2b) with DuckDB oracles.

Every engine capability is declared here as a :class:`QuerySpec`:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string run
against the same parquet files. The driver and the pytest suite both
iterate this registry — it IS the correctness surface.

Conventions that make hash-matching work:

- every computed column is aliased identically in Spark and SQL;
- float aggregates use exact-decimal summation (`functions.deterministic`)
  so results are order-independent and bit-identical across engines;
- inherently order-sensitive stats (stddev/corr) are rounded to 6 dp;
- every ranking/window has a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a plan under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate plan name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def all_plans() -> dict[str, QuerySpec]:
    # Import side-effect modules once, lazily, so `import plans` stays cheap.
    from . import relational  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import python_udf  # noqa: F401
    from . import windows  # noqa: F401
    from . import scalars  # noqa: F401
    from . import arrays_json  # noqa: F401
    from . import dedup_sim  # noqa: F401
    from . import text  # noqa: F401
    from . import events_windows  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_exec  # noqa: F401
    from . import sources_plans  # noqa: F401
    from . import clustering  # noqa: F401
    from . import graph  # noqa: F401
    from . import sampling  # noqa: F401
    from . import llm_pipeline  # noqa: F401

    return REGISTRY
