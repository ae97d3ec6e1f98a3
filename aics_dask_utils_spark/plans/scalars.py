"""Scalar-function plans (E32–E35, E37).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen. No Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           LOWER(p_brand)                                  AS brand_lower,
           SUBSTRING(p_type, 1, 5)                         AS type_prefix,
           TRIM(CONCAT(' ', p_name, ' '))                  AS name_trimmed,
           LENGTH(p_name)                                  AS name_len,
           CONCAT(p_brand, '#', p_type)                    AS brand_type,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1)           AS first_word,
           REGEXP_REPLACE(p_type, '[aeiou]', '_')          AS type_devoweled,
           LEVENSHTEIN(p_brand, SUBSTRING(p_type, 1, LENGTH(p_brand))) AS brand_type_dist,
           SPLIT_PART(p_name, ' ', 1)                      AS first_token,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END   AS has_a
    FROM part
    """,
    doc="string function battery (E32): case/substr/trim/concat/regex/"
    "levenshtein/split/LIKE",
    tags=("scalar",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.length("p_name").alias("name_len"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.levenshtein(
            "p_brand", F.substring("p_type", F.lit(1), F.length("p_brand"))
        ).alias("brand_type_dist"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_token"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)            AS yr,
           CAST(MONTH(o_orderdate) AS INT)           AS mth,
           CAST(DAY(o_orderdate) AS INT)             AS dom,
           CAST(DAYOFWEEK(o_orderdate) AS INT) + 1   AS dow,
           DATE_TRUNC('month', o_orderdate)          AS month_start,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(EPOCH(o_orderdate) AS BIGINT)        AS epoch_sec,
           STRFTIME(o_orderdate, '%Y-%m')            AS ym
    FROM orders
    """,
    doc="date/time battery (E33): extract/trunc/add/diff/epoch/format",
    tags=("scalar",),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # Spark dayofweek: Sunday=1; DuckDB dayofweek: Sunday=0 -> +1
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05)                       AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT)       AS price_floor,
           CAST(CEIL(l_quantity / 7) AS BIGINT)         AS qty_ceil7,
           ROUND(POW(l_quantity, 2) + 1, 6)             AS qty_sq,
           ROUND(LN(l_extendedprice), 6)                AS log_price,
           ROUND(SQRT(l_quantity), 6)                   AS sqrt_qty,
           ROUND(EXP(l_discount), 6)                    AS exp_disc,
           CAST(l_quantity AS BIGINT) % 5               AS qty_mod5,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                AS DOUBLE)                            AS net_dec
    FROM lineitem
    """,
    doc="math battery (E34) incl. decimal cast; transcendentals rounded to "
    "6dp (libm low-bit variance across engines). net_dec rounds through "
    "DECIMAL(18,4) but lands as DOUBLE: a decimal-typed FINAL column is "
    "a driver-hash trap (Spark renders fixed-scale 43683.0600, DuckDB's "
    "pandas fetch 43683.06 — bit-equal values, different hashes; the r5 "
    "red row). 4-dp exact values convert to identical doubles.",
    tags=("scalar",),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.round(F.pow("l_quantity", F.lit(2)) + 1, 6).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("net_dec"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                          AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULTED') AS seg_or_default,
           GREATEST(c_acctbal, 0.0)                     AS bal_clamped,
           LEAST(c_acctbal, 9999.0)                     AS bal_capped,
           CASE WHEN c_nationkey IN (1, 2, 3) THEN 1 ELSE 0 END AS in_nations
    FROM customer
    """,
    doc="conditional battery (E35): CASE/COALESCE/NULLIF/GREATEST/LEAST/IN",
    tags=("scalar",),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULTED")
        ).alias("seg_or_default"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_acctbal"), F.lit(9999.0)).alias("bal_capped"),
        F.when(F.col("c_nationkey").isin(1, 2, 3), 1).otherwise(0).alias(
            "in_nations"
        ),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key
    FROM events
    """,
    doc="JSON path extraction from events.props (E37)",
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@register(
    "scalar_json_typed",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INT) AS k_typed,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
    """,
    doc="from_json with an explicit schema — the scale path: parse once "
    "into a typed struct, not N path extractions (E37)",
    tags=("scalar", "json"),
)
def scalar_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "props_struct", F.from_json("props", "struct<k:int>")
    )
    return parsed.where(F.col("props_struct.k").isNotNull()).select(
        "event_id",
        "event_type",
        F.col("props_struct.k").alias("k_typed"),
        (F.col("props_struct.k") % 10).alias("k_bucket"),
    )


@register(
    "scalar_null_safe",
    oracle="""
    WITH j AS (SELECT CAST(json_extract_string(props, '$.ref') AS BIGINT) AS ref,
                      event_id, user_id, event_type, value
               FROM events)
    SELECT event_id,
           (ref IS NOT DISTINCT FROM user_id)         AS ref_is_user,
           (ref IS DISTINCT FROM user_id)             AS ref_not_user,
           user_id IN (1, 2, 3)                       AS in_small,
           value BETWEEN 10 AND 20                    AS in_band,
           event_type LIKE 'c%'                       AS starts_c,
           CASE WHEN ref IS NULL THEN -1 ELSE ref END AS ref_filled
    FROM j
    ORDER BY event_id
    LIMIT 500
    """,
    doc="null-safe equality (<=>), IN, BETWEEN, LIKE over a nullable "
    "JSON-extracted column (E8,E35,E37) — three-valued logic matched "
    "against IS [NOT] DISTINCT FROM",
    tags=("scalar",),
)
def scalar_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ref = F.get_json_object("props", "$.ref").cast("bigint")
    j = ev.select(
        ref.alias("ref"), "event_id", "user_id", "event_type", "value"
    )
    return (
        j.select(
            "event_id",
            F.col("ref").eqNullSafe(F.col("user_id")).alias("ref_is_user"),
            (~F.col("ref").eqNullSafe(F.col("user_id"))).alias("ref_not_user"),
            F.col("user_id").isin(1, 2, 3).alias("in_small"),
            F.col("value").between(10, 20).alias("in_band"),
            F.col("event_type").like("c%").alias("starts_c"),
            F.when(F.col("ref").isNull(), F.lit(-1)).otherwise(F.col("ref")).alias("ref_filled"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@register(
    "scalar_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="VARIANT semi-structured type (E37, Spark 4): props parsed once "
    "into the binary variant encoding, fields extracted with typed "
    "variant_get — at scale VARIANT columns store parsed-once in "
    "parquet and shredded access skips re-parsing the JSON text per "
    "query, unlike get_json_object",
    tags=("scalar", "json"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type", F.variant_get("v", "$.k", "bigint").alias("k")
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_discount, 0.0) AS price_per_disc,
           TRY_CAST(CASE WHEN l_returnflag = 'A' THEN '42'
                         ELSE 'not-a-number' END AS BIGINT) AS flag_as_int,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="error-safe arithmetic (E34/E35, the permissive-typing policy): "
    "try_divide yields NULL on zero denominators, try_cast NULL on "
    "malformed strings - errors become NULLs flowing through the plan "
    "instead of failing a 100 TB job at row 3 billion",
    tags=("scalar",),
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    flag_str = F.when(F.col("l_returnflag") == "A", F.lit("42")).otherwise(
        F.lit("not-a-number")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))
        ).alias("price_per_disc"),
        flag_str.try_cast("bigint").alias("flag_as_int"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@register(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '\\.([a-z]+)\\.[a-z]+/', 1) AS subdomain_sld
    FROM u ORDER BY doc_id
    """,
    doc="URL parsing (E32 extension, web-corpus curation): a "
    "deterministic URL is synthesized per document on BOTH engines "
    "(the corpus has no URL column), then host / path / query-param "
    "extraction runs via parse_url on the Spark side — the JVM "
    "java.net.URI fast path, inside codegen — against regexp "
    "extraction in the oracle. The canonical-host primitive under "
    "domain-level dedup and per-site quality rollups. Pure map, "
    "zero shuffle before the presentation sort",
    tags=("scalar", "text"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract("url", r"\.([a-z]+)\.[a-z]+/", 1).alias(
            "subdomain_sld"
        ),
    ).orderBy("doc_id")


@register(
    "scalar_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(30,6))) AS DOUBLE) AS total_charged
    FROM lineitem
    WHERE l_quantity >= 40
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="SQL-defined scalar function (Spark 4 CREATE FUNCTION ... "
    "RETURN, E46/E47 extension): the charge formula lives as a named "
    "catalog function and is INLINED by Catalyst into the plan — "
    "reusable business logic with zero UDF overhead (stays inside "
    "whole-stage codegen; contrast Python UDFs, which cross the "
    "serialization boundary). The oracle inlines the same expression",
    tags=("scalar",),
)
def scalar_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge_amount(
          price DOUBLE, discount DOUBLE, tax DOUBLE
        ) RETURNS DOUBLE
        RETURN price * (1 - discount) * (1 + tax)
        """
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(charge_amount(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(30,6))) AS DOUBLE) AS total_charged
        FROM li_sqludf
        WHERE l_quantity >= 40
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )
