"""Spark 4 SQL-surface breadth plans (E47 extensions).

Four engine capabilities a production SQL surface needs that none of
the other plan modules exercise:

- **collation-aware grouping** (``COLLATE UTF8_LCASE``): case folding
  as a property of the comparison, not a rewrite of the data — at
  100 TB you group case-insensitively without materializing a
  lower()'d copy of the key column.
- **LISTAGG ... WITHIN GROUP** (SQL:2016): ordered, de-duplicated
  string aggregation inside the hash aggregate.
- **session variables + EXECUTE IMMEDIATE**: two-step parameterized
  SQL (compute a threshold once, reuse it by name) — the dynamic-SQL
  entry point BI layers script against.
- **Observation API**: data-quality counters piggybacking on the
  production pass itself — scan-level telemetry with NO second job,
  which is the only affordable way to instrument a 100 TB stage.

Reference parity note: the reference (aics_dask_utils) exposes no SQL
surface at all; these extend SURVEY §2b E47's "SQL entry point" row the
same way the other E47 plans do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..sources import load_table
from . import register


# --------------------------------------------------------------------------
# scalar_collation_group — group a deliberately mixed-case key under the
# UTF8_LCASE collation. The collated comparison merges 'PROMO…' and
# 'promo…' rows in the hash aggregate itself; the projected key is
# lower()'d (and cast back to the default collation) so the output is
# deterministic. The DuckDB oracle states the equivalent semantics the
# classical way: normalize-then-group.
# --------------------------------------------------------------------------
@register(
    "scalar_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS typ_mixed,
             p_retailprice
      FROM part
    )
    SELECT lower(typ_mixed) AS p_type_ci,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE)
             AS sum_price
    FROM mixed
    GROUP BY lower(typ_mixed)
    ORDER BY p_type_ci
    """,
    doc="case-insensitive grouping via Spark 4 COLLATE UTF8_LCASE — "
    "collation-aware hash aggregate, no normalized key copy (E47)",
    tags=("scalar", "sql-surface"),
)
def scalar_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mixed = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("typ_mixed"),
        "p_retailprice",
    )
    return (
        mixed.groupBy(F.collate("typ_mixed", "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("sum_price"),
        )
        # lower() for a deterministic representative; cast back to the
        # default collation so downstream consumers see a plain string.
        .select(
            F.lower(F.col("k")).cast("string").alias("p_type_ci"),
            "n_parts",
            "sum_price",
        )
        .orderBy("p_type_ci")
    )


# --------------------------------------------------------------------------
# agg_listagg_report — LISTAGG(DISTINCT …) WITHIN GROUP (ORDER BY …):
# the ordered-concatenation aggregate (SQL:2016) Spark gained in 4.0.
# Dedup + explicit order make the result deterministic at any partition
# count; DuckDB's string_agg(DISTINCT … ORDER BY …) is the exact
# equivalent (verified bit-identical).
# --------------------------------------------------------------------------
@register(
    "agg_listagg_report",
    oracle="""
    SELECT p_brand,
           string_agg(DISTINCT CAST(p_size AS VARCHAR), ','
                      ORDER BY CAST(p_size AS VARCHAR)) AS sizes,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="LISTAGG(DISTINCT) WITHIN GROUP ordered string aggregation "
    "(SQL:2016, Spark 4) == DuckDB string_agg(DISTINCT ORDER BY) (E20/E47)",
    tags=("agg", "sql-surface"),
)
def agg_listagg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_listagg")
    return spark.sql(
        """
        SELECT p_brand,
               listagg(DISTINCT CAST(p_size AS STRING), ',')
                 WITHIN GROUP (ORDER BY CAST(p_size AS STRING)) AS sizes,
               COUNT(*) AS n_parts
        FROM part_listagg
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


# --------------------------------------------------------------------------
# sql_session_variables — DECLARE / SET VARIABLE / EXECUTE IMMEDIATE
# (Spark 4): compute a threshold once into a session variable, then run
# dynamic SQL that references it, binding the table name through
# IDENTIFIER(?) — the parameterized-SQL path without any string
# splicing. The threshold (MAX * 0.5) is exact in double on both
# engines, so the filter boundary is bit-identical.
# --------------------------------------------------------------------------
@register(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="session variables + EXECUTE IMMEDIATE dynamic SQL with an "
    "IDENTIFIER(?) table binding (Spark 4 SQL scripting surface, E47)",
    tags=("sql-surface",),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssv")
    spark.sql("DECLARE OR REPLACE VARIABLE ssv_cutoff DOUBLE DEFAULT 0.0")
    spark.sql(
        "SET VARIABLE ssv_cutoff = (SELECT MAX(o_totalprice) * 0.5 FROM orders_ssv)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, COUNT(*) AS n_orders
           FROM IDENTIFIER(?)
           WHERE o_totalprice > ssv_cutoff
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority'
        USING 'orders_ssv'
        """
    )


# --------------------------------------------------------------------------
# pipeline_observe_metrics — the Observation API as a first-class plan.
# One production job (filter + distinct-count on return flags) carries
# scan-level counters on its back: total rows scanned and the exact
# decimal quantity sum come from the SAME pass, not a second scan. The
# driver-side createDataFrame holds 1 row of already-reduced metrics —
# the distributed work all happened in the observed job.
# --------------------------------------------------------------------------
@register(
    "pipeline_observe_metrics",
    oracle="""
    SELECT (SELECT COUNT(*) FROM lineitem) AS rows_scanned,
           (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
              FROM lineitem) AS qty_sum,
           (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem
             WHERE l_discount > 0.05) AS n_flag_groups
    """,
    doc="Observation API: single-pass pipeline telemetry — row count + "
    "exact quantity sum observed on the production job itself, no "
    "second scan (E47 / pipeline observability)",
    tags=("pipeline", "sql-surface"),
)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation()  # auto-named: safe to re-run in one session
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("qty_sum_dec"),
    )
    n_flag_groups = (
        observed.where(F.col("l_discount") > F.lit(0.05))
        .select("l_returnflag")
        .distinct()
        .count()  # the action that runs the observed job
    )
    m = obs.get
    # empty input: the observed SUM is None (mirroring SQL NULL); keep
    # it NULL rather than crashing or inventing 0.0
    qty = m["qty_sum_dec"]
    return spark.createDataFrame(
        [
            (
                int(m["rows_scanned"]),
                float(qty) if qty is not None else None,
                int(n_flag_groups),
            )
        ],
        "rows_scanned BIGINT, qty_sum DOUBLE, n_flag_groups BIGINT",
    )


# --------------------------------------------------------------------------
# sql_scripting_batch — Spark 4.1 SQL scripting (BEGIN…END, DECLARE,
# WHILE): procedural control flow executed ON the engine, the
# stored-procedure shape warehouse migrations expect. The script
# doubles a price threshold until at most 1000 orders exceed it — each
# loop iteration is a real aggregate job, and only the loop's FINAL
# state is returned. The DuckDB oracle states the same fixpoint
# declaratively: the smallest power-of-two threshold whose exceed-count
# is <= 1000 (thresholds are exact powers of two times 1000, so the
# doubles hash identically).
# --------------------------------------------------------------------------
@register(
    "sql_scripting_batch",
    oracle="""
    WITH cand AS (
      SELECT 1000.0 * pow(2.0, k) AS threshold,
             (SELECT COUNT(*) FROM orders o
               WHERE o.o_totalprice > 1000.0 * pow(2.0, k)) AS n_above
      FROM (SELECT unnest(generate_series(0, 15)) AS k)
    )
    SELECT threshold, n_above
    FROM cand WHERE n_above <= 1000
    ORDER BY threshold LIMIT 1
    """,
    doc="Spark 4.1 SQL scripting: BEGIN/DECLARE/WHILE loop doubling a "
    "threshold until <=1000 orders exceed it — engine-side procedural "
    "SQL, each iteration a real aggregate; oracle states the fixpoint "
    "declaratively (E47 SQL surface)",
    tags=("sql-surface",),
)
def sql_scripting_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_script")
    # enable scripting only for the script's execution (the script runs
    # inside spark.sql; only the final SELECT is returned lazily), then
    # restore the session's prior value so shared sweep/test sessions
    # keep rejecting multi-statement SQL everywhere else
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE t DOUBLE DEFAULT 1000.0;
              DECLARE n BIGINT DEFAULT 0;
              SET n = (SELECT COUNT(*) FROM orders_script WHERE o_totalprice > t);
              WHILE n > 1000 DO
                SET t = t * 2.0;
                SET n = (SELECT COUNT(*) FROM orders_script WHERE o_totalprice > t);
              END WHILE;
              SELECT t AS threshold, n AS n_above;
            END
            """
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


# --------------------------------------------------------------------------
# sql_group_by_all — GROUP BY ALL / ORDER BY ALL (Spark 4 = DuckDB
# semantics: group by every non-aggregate select item, order by every
# output column left-to-right). The BI-layer convenience syntax; the
# plan is the identical hash aggregate the explicit form produces, so
# it costs nothing at scale.
# --------------------------------------------------------------------------
_GROUP_BY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM {table}
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "sql_group_by_all",
    oracle=_GROUP_BY_ALL_SQL.format(table="lineitem"),
    doc="GROUP BY ALL + ORDER BY ALL: infer grouping keys from the "
    "select list and a total output order from all columns — same "
    "SQL text runs verbatim on Spark 4 and DuckDB (E47 SQL surface)",
    tags=("sql-surface", "agg"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql(_GROUP_BY_ALL_SQL.format(table="lineitem_gba"))
