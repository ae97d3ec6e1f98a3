"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the reference's test strategy — independent-baseline comparison
with order-insensitive equality (reference
``tests/test_distributed_handler.py:20-39``: handler output vs raw
executor output via ``set()``) — scaled up to relational results:
both engines run over the same parquet files; results are canonicalized
(columns sorted by name, rows sorted by all columns, timestamps to µs)
and compared cell-by-cell, bit-exactly by default.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import duckdb
import pandas as pd

from .sources.readers import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """Fresh in-memory DuckDB with the driver tables registered as views —
    the same registration scheme the driver's t2 harness uses."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize_cell(v):
    """Make heterogeneous cells sortable/comparable across engines:
    date -> Timestamp.

    List/ndarray cells are REFUSED: the driver's canonicalizer runs a
    raw pandas ``sort_values`` over every column and list cells raise
    ``TypeError: unhashable type`` there (round-2 failure class). The
    local gate must fail the same way, not tuple-normalize the problem
    away — plans serialize arrays (concat_ws <-> array_to_string) or
    explode them to rows before the final select.

    Decimal cells are REFUSED too (round-5 failure class,
    ``scalar_math``): the driver's value hash renders Spark's
    fixed-scale DECIMAL(18,4) as ``43683.0600`` while DuckDB's pandas
    fetch gives float64 ``43683.06`` — bit-equal values, different
    hashes. This harness used to normalize Decimal -> float, which is
    exactly how the local 50/50-green gate missed the driver's 49/50.
    Plans must ``CAST(... AS DOUBLE)`` (or BIGINT) the final column on
    BOTH engines; decimals are fine mid-plan for exact accumulation."""
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, decimal.Decimal):
        raise TypeError(
            "Decimal-typed result cell: the driver's value hash renders "
            "Spark fixed-scale decimals ('43683.0600') differently from "
            "DuckDB's float64 fetch ('43683.06') even when values are "
            "bit-equal (round-5 scalar_math). CAST the final column to "
            "DOUBLE/BIGINT on both engines; keep decimals mid-plan only."
        )
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError(
            "list-typed result cell: the driver's canonicalizer cannot "
            "sort ARRAY/STRUCT/MAP cells (unhashable in sort_values). "
            "Serialize the column (concat_ws <-> array_to_string) or "
            "explode it to rows before the plan's final select."
        )
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns; normalize dtypes that
    differ representationally between engines (ns vs µs timestamps,
    category, decimal objects)."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            # Spark is µs; DuckDB parquet ns — truncate both to µs.
            out[col] = s.dt.floor("us")
            if getattr(out[col].dt, "tz", None) is not None:
                out[col] = out[col].dt.tz_localize(None)
        elif s.dtype == object:
            out[col] = s.map(_normalize_cell)
    sort_cols = list(out.columns)
    if sort_cols:
        out = out.sort_values(
            by=sort_cols, kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    return out


def _cell_equal(a, b, rel_tol: float, abs_tol: float) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        a_null = a_null or bool(pd.isna(a))
        b_null = b_null or bool(pd.isna(b))
    except (TypeError, ValueError):
        pass
    if a_null or b_null:
        return a_null == b_null
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a_l, b_l = list(a), list(b)
        return len(a_l) == len(b_l) and all(
            _cell_equal(x, y, rel_tol, abs_tol) for x, y in zip(a_l, b_l)
        )
    return a == b


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    rel_tol: float = 0.0,
    abs_tol: float = 0.0,
    context: str = "",
) -> None:
    """Default tolerance is ZERO: the driver's gate hashes values, so a
    plan that is merely 1e-9-close would pass locally and fail there.
    Every registered plan holds bit-exactly (deterministic decimal sums,
    6-9dp rounding policy); keep it that way.

    Also DTYPE-strict on the int-vs-float axis: the driver's value hash
    distinguishes ``1000`` (int64) from ``1000.0`` (float64) even though
    ``math.isclose`` does not.  The classic trigger is DuckDB's
    ``SUM(INTEGER)`` returning HUGEINT (fetched as float64) while Spark
    returns int64 — the oracle must ``CAST(SUM(...) AS BIGINT)``.  A
    column that is integer-dtyped on one engine and float-dtyped on the
    other fails here before the driver ever sees it."""
    left = canonicalize(spark_pdf)
    right = canonicalize(oracle_pdf)
    assert list(left.columns) == list(right.columns), (
        f"{context}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    for col in left.columns:
        l_int = pd.api.types.is_integer_dtype(left[col])
        r_int = pd.api.types.is_integer_dtype(right[col])
        l_flt = pd.api.types.is_float_dtype(left[col])
        r_flt = pd.api.types.is_float_dtype(right[col])
        if (l_int and r_flt) or (l_flt and r_int):
            raise AssertionError(
                f"{context}: col {col!r} dtype skew: spark={left[col].dtype} "
                f"oracle={right[col].dtype} — the driver's value hash treats "
                "1000 and 1000.0 as different; CAST the oracle aggregate "
                "(DuckDB SUM(INTEGER) returns HUGEINT->float64) or align the "
                "Spark side"
            )
    assert len(left) == len(right), (
        f"{context}: row count {len(left)} vs oracle {len(right)}"
    )
    for col in left.columns:
        lv, rv = left[col].tolist(), right[col].tolist()
        for i, (a, b) in enumerate(zip(lv, rv)):
            if not _cell_equal(a, b, rel_tol, abs_tol):
                raise AssertionError(
                    f"{context}: col {col!r} row {i}: spark={a!r} oracle={b!r}"
                )


def assert_scalar_schema(schema, context: str = "") -> None:
    """Registry-wide complex-type lint: no plan's FINAL schema may carry
    ArrayType/StructType/MapType — the driver's canonicalizer sorts raw
    pandas cells and crashes on unhashable list cells (round-2 failure
    class: ``multimodal_decode_slice``, ``kmeans_embeddings``). Arrays
    are fine mid-plan; serialize or explode before the last select.

    DecimalType is refused for the same reason (round-5 failure class:
    ``scalar_math``): the driver's hash renders Spark's fixed-scale
    decimal text differently from DuckDB's float64 fetch even when the
    values are bit-equal. Accumulate in decimal mid-plan; CAST the
    final column to DOUBLE (or BIGINT) on both engines."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{context}: complex-typed final columns {bad} — the driver's "
        "canonicalizer cannot sort ARRAY/STRUCT/MAP cells; serialize "
        "(concat_ws <-> array_to_string) or explode to rows"
    )
    dec = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not dec, (
        f"{context}: decimal-typed final columns {dec} — the driver's "
        "value hash renders Spark fixed-scale decimals differently from "
        "DuckDB's float64 fetch even when bit-equal (r5 scalar_math); "
        "CAST the final column to DOUBLE/BIGINT on both engines"
    )


def run_plan_vs_oracle(
    spark,
    name: str,
    sf_dir: str = DEFAULT_SF_DIR,
    con: Optional["duckdb.DuckDBPyConnection"] = None,
) -> pd.DataFrame:
    """Run one registered plan on Spark and its oracle on DuckDB; assert
    they match. Returns the Spark result (pandas) for extra assertions."""
    from .plans import all_plans

    spec = all_plans()[name]
    sdf = spec.fn(spark, sf_dir)
    assert_scalar_schema(sdf.schema, context=name)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, mirrors the driver
        return spark_pdf
    own = con is None
    if own:
        con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        if own:
            con.close()
    assert_frames_match(spark_pdf, oracle_pdf, context=name)
    return spark_pdf
