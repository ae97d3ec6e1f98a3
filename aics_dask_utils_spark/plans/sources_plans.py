"""Source-format plans (E2): CSV / JSON-lines round trips under the
oracle gate.

Each plan WRITES a slice of a driver table to /tmp in the text format,
reads it back with an explicit schema (the 100 TB default — inference
is an extra full pass), and aggregates; the oracle aggregates the
original parquet directly. A hash match proves the format round-trip
is lossless (Spark writes shortest-round-trip doubles and ISO
timestamps) and the scan honors the declared schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..sources import load_table, read_csv, read_json
from . import register


def _tmp(sf_dir: str, fmt: str) -> str:
    # pid-scoped scratch root: stable across a plan's write-then-read
    # within one process, but two concurrent sessions (e.g. the grading
    # driver and a sweep) can never overwrite each other's staged data
    # mid-read. Process exit leaves the dir behind — /tmp hygiene, not
    # correctness; sizes here are sf-subset small.
    tag = os.path.basename(sf_dir.rstrip("/"))
    return f"/tmp/spark_graft_{os.getpid()}_{fmt}_{tag}"


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_quantity >= 45
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="CSV round trip (E2): filtered lineitem slice written as CSV, "
    "re-read with an explicit schema, aggregated — hash-matched against "
    "the parquet original",
    tags=("source",),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    sel = li.select("l_returnflag", "l_quantity")
    path = _tmp(sf_dir, "csv")
    sel.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=sel.schema)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
           MIN(o_orderdate) AS first_order
    FROM orders
    WHERE o_totalprice > 300000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="JSON-lines round trip (E2) incl. timestamp fidelity: filtered "
    "orders written as JSONL, re-read with explicit schema, aggregated",
    tags=("source",),
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    sel = orders.select("o_orderstatus", "o_totalprice", "o_orderdate")
    path = _tmp(sf_dir, "json")
    sel.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=sel.schema)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_orderdate").alias("first_order"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sink_partitioned_roundtrip",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="Hive-partitioned sink round trip (E5): lineitem written "
    "partitionBy(l_returnflag), read back with a partition filter that "
    "PRUNES at the scan (asserted in test_sources_sinks), aggregated "
    "against the unpartitioned oracle",
    tags=("source",),
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import write_partitioned

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    path = _tmp(sf_dir, "part_rf")
    write_partitioned(li, path, ["l_returnflag"])
    back = spark.read.parquet(path).where(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy("l_linestatus")
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="ORC round trip (E2/E5): customer written as ORC, read back, "
    "aggregated — the columnar-format breadth check beyond parquet",
    tags=("source",),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    )
    path = _tmp(sf_dir, "orc")
    cust.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("sum_bal"))
        .orderBy("c_mktsegment")
    )


@register(
    "sink_upsert_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    updates AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           CASE WHEN u.o_orderkey IS NULL THEN 'kept'
                WHEN b.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM base b FULL OUTER JOIN updates u USING (o_orderkey)
    """,
    doc="MERGE/upsert sink (E5): updates win over base, unmatched "
    "updates insert, unmatched base rows survive — the full-outer-join "
    "formulation of MERGE INTO, round-tripped through a parquet sink. "
    "At scale both sides shuffle once on the merge key (or zero times "
    "if the base table is bucketed on it)",
    tags=("source", "join"),
)
def sink_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.where(F.col("o_orderkey") % 2 == 0)
    updates = orders.where(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    b, u = base.alias("b"), updates.alias("u")
    merged = b.join(u, on="o_orderkey", how="full_outer").select(
        F.col("o_orderkey"),
        F.coalesce("u.o_orderstatus", "b.o_orderstatus").alias("o_orderstatus"),
        F.coalesce("u.o_totalprice", "b.o_totalprice").alias("o_totalprice"),
        F.when(F.col("u.o_orderstatus").isNull(), "kept")
        .when(F.col("b.o_orderstatus").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )
    path = _tmp(sf_dir, "merge")
    merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "sink_scd2_history",
    oracle="""
    WITH upd AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, c_acctbal,
           DATE '1995-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           1 AS is_current
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, c_acctbal,
           DATE '1995-01-01' AS valid_from,
           DATE '1998-06-01' AS valid_to,
           0 AS is_current
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_acctbal,
           DATE '1998-06-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           1 AS is_current
    FROM upd
    """,
    doc="SCD type-2 dimension history (E5/E55 family): applying a change "
    "batch to a dimension snapshot closes out changed rows "
    "(valid_to = effective date, is_current 0) and opens new versions, "
    "unchanged rows pass through — the warehouse pattern for tracking "
    "attribute history. Change detection is a left_semi/left_anti pair "
    "on the key (one shuffle each, zero if the dimension is bucketed); "
    "version rows are a union of three narrow branches",
    tags=("sink", "join"),
)
def sink_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_date = F.to_date(F.lit("1995-01-01"))
    eff_date = F.to_date(F.lit("1998-06-01"))
    null_date = F.lit(None).cast("date")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    upd = cust.where(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    upd_keys = upd.select("c_custkey")
    unchanged = cust.join(upd_keys, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_acctbal",
        base_date.alias("valid_from"),
        null_date.alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    closed = cust.join(upd_keys, "c_custkey", "left_semi").select(
        "c_custkey",
        "c_acctbal",
        base_date.alias("valid_from"),
        eff_date.alias("valid_to"),
        F.lit(0).alias("is_current"),
    )
    opened = upd.select(
        "c_custkey",
        "c_acctbal",
        eff_date.alias("valid_from"),
        null_date.alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


@register(
    "source_schema_evolution",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_priority_band
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice >= 150000 THEN 'high' ELSE 'low' END AS o_priority_band
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT COALESCE(o_priority_band, 'unknown') AS o_priority_band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM unioned
    GROUP BY 1 ORDER BY 1
    """,
    doc="schema evolution on read (E2/E5): two parquet batches written "
    "with DIFFERENT schemas (v2 adds a column), read back as ONE "
    "dataset via mergeSchema — old rows surface NULL for the new "
    "column. The lake-ingestion reality at 100 TB: producers add "
    "columns over time and readers must span both vintages without "
    "rewriting history",
    tags=("source",),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = orders.where(F.col("o_orderkey") % 2 == 0)
    v2 = orders.where(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_priority_band",
        F.when(F.col("o_totalprice") >= 150000, "high").otherwise("low"),
    )
    path = _tmp(sf_dir, "evolve")
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(
            F.coalesce("o_priority_band", F.lit("unknown")).alias("o_priority_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .orderBy("o_priority_band")
    )


@register(
    "sink_compacted_files",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    """,
    doc="small-file compaction sink (E5): lineitem re-written through "
    "repartition(4) + maxRecordsPerFile so the output is a few "
    "right-sized files instead of one-per-task shards — the compaction "
    "pass every 100 TB lake needs to keep scan planning cheap. The "
    "file-count contract (<= 4 x ceil(rows/maxRecords)) is asserted in "
    "tests/test_sources_sinks.py; the hash match proves losslessness",
    tags=("sink",),
)
def sink_compacted_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    path = _tmp(sf_dir, "compact")
    (
        li.repartition(4)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 500_000)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("sum_price"),
    )


@register(
    "sink_sorted_clustered",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    """,
    doc="range-clustered sorted write (E5 scale path): repartitionByRange "
    "on the filter key + sortWithinPartitions before writing, so every "
    "output file covers a DISJOINT key range and its parquet row-group "
    "min/max stats prune date-filtered scans to a file subset — the "
    "data-skipping layout every 100 TB fact table needs. File-range "
    "disjointness is asserted in tests/test_sources_sinks.py; the hash "
    "match proves losslessness",
    tags=("sink",),
)
def sink_sorted_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    path = _tmp(sf_dir, "clustered")
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        dsum("l_extendedprice").alias("sum_price"),
    )


@register(
    "sink_cdc_apply",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 'U' AS op, 2 AS seq
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, NULL AS o_totalprice, 'D' AS op, 3 AS seq
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    latest AS (
      SELECT o_orderkey, o_totalprice, op FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                    ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT COALESCE(l.op, 'K') AS final_op,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(COALESCE(l.o_totalprice, b.o_totalprice) * 100)
                    AS BIGINT)) AS BIGINT) AS cents
    FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
    WHERE COALESCE(l.op, 'K') <> 'D'
    GROUP BY final_op ORDER BY final_op
    """,
    doc="ordered CDC apply (E55 family): a change batch with sequence "
    "numbers collapses to latest-per-key (one window), deletes drop "
    "rows, updates override the snapshot via a left join — the "
    "log-to-table materialization under every replicated lake table. "
    "One shuffle for the collapse, one for the key join (zero if the "
    "snapshot is bucketed on the key)",
    tags=("sink", "join"),
)
def sink_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    upd = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    dele = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
    )
    changes = upd.unionByName(dele)
    w = W.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", F.col("o_totalprice").alias("c_price"), "op")
    )
    applied = (
        orders.join(latest, "o_orderkey", "left")
        .withColumn("final_op", F.coalesce("op", F.lit("K")))
        .where(F.col("final_op") != "D")
        .withColumn("price", F.coalesce("c_price", "o_totalprice"))
    )
    return (
        applied.groupBy("final_op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
        )
        .orderBy("final_op")
    )


@register(
    "sink_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="bucketed co-located join (E13/E67, the biggest deletable "
    "shuffle at 100 TB): lineitem and orders written bucketBy(8, "
    "orderkey) sortBy(orderkey) as managed tables, read back via "
    "spark.table (path reads lose bucket metadata), sort-merge joined "
    "with NO Exchange on either side — the scans themselves are hash-"
    "distributed, so a standing fact table pays the shuffle once at "
    "write time and never again. Exchange-free plan asserted in "
    "tests/test_scale_patterns.py; the aggregate here is value-checked "
    "against the plain unbucketed oracle",
    tags=("source", "join"),
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import bucketed_join_ready, write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_t, o_t = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, li_t, ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, o_t, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    joined = bucketed_join_ready(spark, li_t).join(
        bucketed_join_ready(spark, o_t).hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


_Z_INTERLEAVE = "(((na >> 0) & 1) << 0) | (((nb >> 0) & 1) << 1) | (((na >> 1) & 1) << 2) | (((nb >> 1) & 1) << 3) | (((na >> 2) & 1) << 4) | (((nb >> 2) & 1) << 5) | (((na >> 3) & 1) << 6) | (((nb >> 3) & 1) << 7) | (((na >> 4) & 1) << 8) | (((nb >> 4) & 1) << 9) | (((na >> 5) & 1) << 10) | (((nb >> 5) & 1) << 11) | (((na >> 6) & 1) << 12) | (((nb >> 6) & 1) << 13) | (((na >> 7) & 1) << 14) | (((nb >> 7) & 1) << 15) | (((na >> 8) & 1) << 16) | (((nb >> 8) & 1) << 17) | (((na >> 9) & 1) << 18) | (((nb >> 9) & 1) << 19)"


@register(
    "sink_zorder_clustered",
    oracle=f"""
    WITH b AS (
      SELECT MIN(l_partkey) AS pa, MAX(l_partkey) AS qa,
             MIN(l_suppkey) AS pb, MAX(l_suppkey) AS qb
      FROM lineitem
    ),
    n AS (
      SELECT CAST(floor(((l_partkey - pa) * 1023) /
                 CAST(GREATEST(qa - pa, 1) AS DOUBLE)) AS BIGINT) AS na,
             CAST(floor(((l_suppkey - pb) * 1023) /
                 CAST(GREATEST(qb - pb, 1) AS DOUBLE)) AS BIGINT) AS nb
      FROM lineitem CROSS JOIN b
    ),
    z AS (SELECT {_Z_INTERLEAVE} AS zkey FROM n)
    SELECT COUNT(*) AS n_rows,
           MIN(zkey) AS min_zkey,
           MAX(zkey) AS max_zkey,
           CAST(SUM(zkey) AS BIGINT) AS sum_zkey
    FROM z
    """,
    doc="Z-ORDER clustered write (lakehouse OPTIMIZE ZORDER BY, E5/E67 "
    "multi-column tier): (l_partkey, l_suppkey) normalized to 10 bits "
    "each off table min/max stats and Morton-interleaved into one "
    "clustering key — pure integer bit arithmetic, identical on any "
    "engine — then repartitionByRange + sortWithinPartitions on the "
    "key before writing. Rows close in EITHER dimension land close in "
    "file order, so parquet row-group min/max stats prune scans "
    "filtered on either column (a single-column sort only skips for "
    "itself). File z-range disjointness asserted in "
    "tests/test_sources_sinks.py; the aggregate (count + min/max + "
    "full-key checksum) hash-proves the key math and losslessness",
    tags=("sink",),
)
def sink_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import zorder_key

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    z = zorder_key("l_partkey", "l_suppkey", b[0], b[1], b[2], b[3], bits=10)
    path = _tmp(sf_dir, "zorder")
    (
        li.withColumn("zkey", z)
        .repartitionByRange(4, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("zkey").alias("min_zkey"),
        F.max("zkey").alias("max_zkey"),
        F.sum("zkey").cast("bigint").alias("sum_zkey"),
    )


@register(
    "source_text_roundtrip",
    oracle=r"""
    WITH t AS (SELECT text FROM documents WHERE lang = 'en')
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_split_to_array(lower(trim(text)), '\s+')))
             AS BIGINT) AS total_tokens,
           MIN(md5(text)) AS min_line_md5
    FROM t
    """,
    doc="text-lines round trip (E2, completing the format matrix: "
    "parquet/CSV/JSON/ORC/binary/text): the English documents written "
    "as one raw line each (spark.write.text), re-read with "
    "spark.read.text — the raw-corpus ingestion path (Common Crawl "
    "WET, one-doc-per-line dumps). Line counts, char/token mass, and "
    "a content digest hash-match the parquet original, proving the "
    "round trip is byte-lossless. Text scans split by line offset at "
    "100 TB exactly like CSV",
    tags=("source",),
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    path = _tmp(sf_dir, "text")
    # one document per line; the synthetic corpus has no newlines
    docs.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path).withColumnRenamed("value", "text")
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(T.tokens("text"))).cast("long").alias("total_tokens"),
        F.min(F.md5(F.col("text").cast("binary"))).alias("min_line_md5"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle=r"""
    WITH final AS (
      SELECT lang, doc_id,
             CASE WHEN lang = 'en' THEN upper(text) ELSE text END AS text
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(md5(text)) AS min_md5
    FROM final GROUP BY lang ORDER BY lang
    """,
    doc="dynamic partition overwrite (E5/E63 extension — the "
    "partitioned-table UPDATE pattern): the corpus lands partitioned "
    "by lang, then a REVISED English slice is written with "
    "partitionOverwriteMode=dynamic — ONLY the lang=en partition is "
    "replaced, every other partition's files are untouched (no "
    "read-modify-write of the whole table). The read-back per-lang "
    "stats hash-match an oracle computing the expected post-overwrite "
    "state; a content digest proves the en rows are the revised ones "
    "and the others are the originals. At 100 TB this is how daily "
    "re-processing replaces one day/language without rewriting the "
    "standing table",
    tags=("source",),
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    path = _tmp(sf_dir, "dyn_overwrite")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    revised = docs.where(F.col("lang") == "en").withColumn(
        "text", F.upper(F.col("text"))
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        revised.write.mode("overwrite").partitionBy("lang").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    back = spark.read.parquet(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.min(F.md5(F.col("text").cast("binary"))).alias("min_md5"),
        )
        .orderBy("lang")
    )


def _seq_values_sql(n: int = 12) -> str:
    rows = ",".join(
        f"({i}, 'item{i}', {i * 0.25!r})" for i in range(n)
    )
    return f"(VALUES {rows}) v(id, name, val)"


@register(
    "source_sequences_roundtrip",
    oracle=f"""
    SELECT CAST(id AS BIGINT) AS item_id,
           name,
           CAST(val AS DOUBLE) AS val,
           CAST(val AS DOUBLE) * 2 AS doubled,
           CAST(length(name) AS INT) AS name_len
    FROM {_seq_values_sql(12)}
    ORDER BY item_id
    """,
    doc="in-memory sequences -> table round trip (E4): three aligned "
    "Python sequences zipped into a DataFrame via from_sequences (the "
    "reference's multi-iterable client.map zip, "
    "/root/reference/aics_dask_utils/distributed_handler.py:135-140, "
    "as a relation), then transformed relationally — the oracle is the "
    "same rows as SQL VALUES. 0.25-step doubles are binary-exact so "
    "the hash match is bit-strict",
    tags=("source",),
)
def source_sequences_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import from_sequences

    n = 12
    df = from_sequences(
        spark,
        list(range(n)),
        [f"item{i}" for i in range(n)],
        [i * 0.25 for i in range(n)],
        schema="item_id long, name string, val double",
    )
    return df.select(
        "item_id",
        "name",
        "val",
        (F.col("val") * 2).alias("doubled"),
        F.length("name").alias("name_len"),
    ).orderBy("item_id")


@register(
    "source_python_datasource",
    oracle="""
    WITH g AS (
      SELECT i,
             ['alpha','beta','gamma','delta','epsilon'][CAST(i % 5 AS INT) + 1]
               AS label,
             i * 0.5 AS score,
             (i * i) % 97 AS bucket
      FROM (SELECT unnest(range(0, 1000)) AS i)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE) AS sum_score,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets
    FROM g GROUP BY label ORDER BY label
    """,
    doc="custom pure-Python data source (E2 extensibility, Spark 4 "
    "DataSource API): the 'graftgen' connector plans 8 metadata-only "
    "range partitions on the driver and generates rows executor-side "
    "per split — the JDBC-range/Kafka-offset/REST-paginator connector "
    "shape with zero JVM code. Rows are a pure function of the global "
    "id, so the aggregate hash-matches an oracle that regenerates the "
    "table relationally, proving the connector's partitioned scan is "
    "lossless and partitioning-independent",
    tags=("source",),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import dsum
    from ..sources.python_datasource import register_graftgen

    register_graftgen(spark)
    df = (
        spark.read.format("graftgen")
        .option("n_rows", 1000)
        .option("n_parts", 8)
        .load()
    )
    return (
        df.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("score").alias("sum_score"),
            F.countDistinct("bucket").cast("long").alias("n_buckets"),
        )
        .orderBy("label")
    )


@register(
    "sink_python_datasource_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="custom pure-Python SINK round trip (E5/E6 extensibility, "
    "Spark 4 DataSource writer API): the 'graftsink' connector writes "
    "each partition executor-side as a staged part file and returns a "
    "commit message; the driver's commit() publishes a _SUCCESS "
    "manifest (files + total rows) — the two-phase commit protocol "
    "every object-store sink follows: parts stage under the job's "
    "_staging-<jobid>/, commit() promotes only message-named files, "
    "abort() drops the staging dir. The read-back trusts the "
    "manifest's file list (never "
    "a glob — a mid-write task death leaves partial files a glob would "
    "read), parses relationally, and the per-lang aggregate "
    "hash-matches an oracle over the original parquet — lossless "
    "through a connector with zero JVM code",
    tags=("source",),
)
def sink_python_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..sources.python_datasource import read_graft_table, register_graftsink

    register_graftsink(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    )
    path = _tmp(sf_dir, "pysink")
    shutil.rmtree(path, ignore_errors=True)
    docs.write.format("graftsink").option("path", path).mode("append").save()
    raw = read_graft_table(spark, path)
    parts = F.split(F.col("value"), "\x1f")
    back = raw.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).cast("long").alias("n_chars"),
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


@register(
    "source_xml_roundtrip",
    oracle="""
    SELECT n.n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal,
           MIN(s.s_name) AS first_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey ORDER BY n.n_regionkey
    """,
    doc="XML round trip (E2, Spark 4 native XML source — no external "
    "package): supplier joined to its region key, written as rowTag'd "
    "XML, re-read with an explicit schema (inference is an extra full "
    "pass at scale), aggregated — hash-matched against the parquet "
    "original, proving the markup round-trip is lossless for longs, "
    "doubles, and strings",
    tags=("source",),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    sel = sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]).select(
        "n_regionkey", "s_name", "s_acctbal"
    )
    path = _tmp(sf_dir, "xml")
    (
        sel.write.mode("overwrite")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .format("xml")
        .save(path)
    )
    back = (
        spark.read.schema(sel.schema)
        .option("rowTag", "supplier")
        .format("xml")
        .load(path)
    )
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("s_acctbal").alias("sum_bal"),
            F.min("s_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )
