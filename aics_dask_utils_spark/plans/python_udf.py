"""Arbitrary-Python map surface (E9, E46) with oracle parity.

The reference's core contract is "run any serializable Python callable
over aligned sequences" (reference `aics_dask_utils/distributed_handler.py:113-114`,
`:135-140`). On Spark that contract lives in the Arrow-vectorized UDF
family — scalar ``pandas_udf`` (batch-columnar, ~10-100× row UDFs),
grouped-agg ``pandas_udf`` (a UDAF over whole groups), and
``mapInPandas`` (arbitrary batch→batch transforms, the `batched_map`
generalization). Each plan here exercises one of those entry points
with semantics an ANSI oracle can replicate, so the Python boundary
itself is under the hash-check — not just JVM expressions.

Determinism policy: UDF math is kept in exact integer space (cents via
round(×100)) so results are independent of row order, partition count,
and Arrow batch size — float accumulation order inside a UDF is NOT
reproducible across engines, integer sums are.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources import load_table
from . import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="scalar pandas_udf (Arrow batch in/out) computing discounted "
    "revenue in exact cents, aggregated JVM-side (E9,E46); the Python "
    "boundary crosses once per batch, not per row",
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def revenue_cents(price: pd.Series, discount: pd.Series) -> pd.Series:
        import numpy as np

        # float64 per-row arithmetic is IEEE-deterministic; the round-to-
        # cents keeps the downstream SUM in exact integer space. floor(x+.5)
        # = SQL ROUND (half away from zero) for the positive domain — pandas
        # .round() is half-to-even and would drift on exact halves.
        return pd.Series(
            np.floor(price.to_numpy() * (1.0 - discount.to_numpy()) * 100.0 + 0.5)
        ).astype("int64")

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.withColumn(
            "cents", revenue_cents(F.col("l_extendedprice"), F.col("l_discount"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="grouped-agg pandas_udf: a custom UDAF receiving each whole group "
    "as one Arrow series (E46); integer-cents math keeps it "
    "order-independent. NOTE: no partial aggregation — at 100 TB prefer "
    "built-in aggs or Algebird-style mergeable sketches; this is the "
    "escape hatch, not the default",
    tags=("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("long")
    def total_cents(price: pd.Series) -> int:
        return int(np.floor(price.to_numpy() * 100.0 + 0.5).astype("int64").sum())

    @pandas_udf("long")
    def max_cents(price: pd.Series) -> int:
        return int(np.floor(price.to_numpy() * 100.0 + 0.5).astype("int64").max())

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            total_cents(F.col("o_totalprice")).alias("total_cents"),
            max_cents(F.col("o_totalprice")).alias("max_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "udf_map_in_pandas",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           n_chars
    FROM documents
    WHERE n_chars > 0
      AND len(regexp_split_to_array(trim(text), '\s+')) >= 40
    """,
    doc="mapInPandas: arbitrary batch->batch transform (filter + derive) — "
    "the reference's batched_map generalized to Arrow record batches "
    "(E9,E46); streams batches, never materializes a partition",
    tags=("udf",),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def tokenize_filter(batches):
        for pdf in batches:
            n_tokens = (
                pdf["text"].str.strip().str.split().str.len().fillna(0).astype("int64")
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": n_tokens,
                    "n_chars": pdf["n_chars"],
                }
            )
            yield out[(out["n_chars"] > 0) & (out["n_tokens"] >= 40)]

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return docs.mapInPandas(
        tokenize_filter, "doc_id long, n_tokens long, n_chars long"
    )


@register(
    "udf_cogrouped_map",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_totalprice * 100 AS BIGINT) IS NOT NULL AS has_price,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)), 0) AS BIGINT) AS qty_cents
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY o.o_orderkey, has_price
    ORDER BY o.o_orderkey
    """,
    doc="cogrouped-map applyInPandas (E46): orders and lineitem cogrouped "
    "on orderkey, each pair of group frames reduced in pandas — the "
    "two-sided arbitrary-Python join surface; integer-cents math keeps "
    "it order-independent",
    tags=("udf",),
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql import functions as F

    def merge(o_pdf: pd.DataFrame, l_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(o_pdf):
            return pd.DataFrame(
                columns=["o_orderkey", "has_price", "n_lines", "qty_cents"]
            )
        qty = (
            int(np.floor(l_pdf["l_quantity"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
            if len(l_pdf)
            else 0
        )
        return pd.DataFrame(
            {
                "o_orderkey": [int(o_pdf["o_orderkey"].iloc[0])],
                "has_price": [True],
                "n_lines": [int(len(l_pdf))],
                "qty_cents": [qty],
            }
        )

    from ..sources import load_table

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 450000
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            merge,
            "o_orderkey long, has_price boolean, n_lines long, qty_cents long",
        )
        .orderBy("o_orderkey")
    )


@register(
    "udf_python_udtf",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, term, length(term) AS term_len
    FROM s WHERE length(term) >= 8
    """,
    doc="Python user-defined TABLE function (E46, the UDTF surface new "
    "in Spark 3.5+): one input row expands to N output rows inside a "
    "Python class's eval() — here a tokenizer emitting long terms. "
    "The lateral-join expansion the reference's per-element map cannot "
    "express (one task = one result) but a table function can",
    tags=("udf",),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # useArrow: plans as ArrowEvalPythonUDTF — rows cross the Python
    # boundary in Arrow batches instead of pickled one-at-a-time
    # (BatchEvalPythonUDTF), same contract as every other Python
    # surface in this repo; eval() itself is still called per row, as
    # the UDTF API defines.
    @udtf(returnType="doc_id bigint, term string, term_len int", useArrow=True)
    class LongTerms:
        def eval(self, doc_id: int, text: str):
            for term in text.strip().lower().split():
                if len(term) >= 8:
                    yield doc_id, term, len(term)

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        docs.lateralJoin(
            LongTerms(F.col("doc_id").outer(), F.col("text").outer())
        ).select("term", "term_len", docs["doc_id"])
        .select("doc_id", "term", "term_len")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="mapInArrow (E46): the zero-copy end of the UDF family — batches "
    "arrive as raw pyarrow RecordBatches with no pandas conversion, the "
    "right entry point when the Python side is itself Arrow-native "
    "(numpy/polars/tensor libs). Cents math in exact integer space",
    tags=("udf",),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def to_cents(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            import numpy as np

            price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            cents = np.floor(price * 100.0 + 0.5).astype("int64")
            yield pa.RecordBatch.from_arrays(
                [t.column("o_orderstatus").combine_chunks(), pa.array(cents)],
                names=["o_orderstatus", "cents"],
            )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    mapped = orders.mapInArrow(to_cents, "o_orderstatus string, cents long")
    return (
        mapped.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .orderBy("o_orderstatus")
    )


@register(
    "udf_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="grouped-map applyInArrow (E46, Spark 4): whole groups arrive as "
    "pyarrow Tables with NO pandas conversion — the zero-copy grouped "
    "path for Arrow-native Python (numpy/polars). Each group reduces to "
    "one summary row in exact integer cents; pairs with udf_map_in_arrow "
    "to complete the Arrow UDF matrix (map + grouped-map). Grouped "
    "Python is a keyed shuffle then per-group batches — same scale "
    "shape as applyInPandas, minus the pandas copy",
    tags=("udf",),
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def summarize(table: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        price = table.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype("int64")
        flag = table.column("l_returnflag")[0].as_py()
        return pa.table(
            {
                "l_returnflag": pa.array([flag]),
                "n": pa.array([len(cents)], type=pa.int64()),
                "cents": pa.array([int(cents.sum())], type=pa.int64()),
                "max_cents": pa.array([int(cents.max())], type=pa.int64()),
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .applyInArrow(
            summarize, "l_returnflag string, n long, cents long, max_cents long"
        )
        .orderBy("l_returnflag")
    )


@register(
    "udtf_sql_table_function",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="SQL-defined TABLE function (Spark 4 CREATE FUNCTION ... "
    "RETURNS TABLE, completing E46's UDTF axis beside the Python "
    "@udtf): a parameterized relation-returning function whose body is "
    "a SQL query over the catalog — Catalyst inlines the invocation "
    "like a parameterized view, so predicates and pruning flow through "
    "(no UDTF execution boundary, contrast the Python UDTF). The "
    "oracle inlines the same parameterized filter",
    tags=("udf", "relational"),
)
def udtf_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_tf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION orders_in_band(lo DOUBLE, hi DOUBLE)
        RETURNS TABLE(o_orderpriority STRING, o_totalprice DOUBLE)
        RETURN SELECT o_orderpriority, o_totalprice
               FROM orders_tf WHERE o_totalprice BETWEEN lo AND hi
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        FROM orders_in_band(100000, 200000)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )
