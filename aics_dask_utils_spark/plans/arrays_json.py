"""Array / higher-order-function plans over the embeddings table (E12, E36).

Everything here runs as JVM higher-order functions (`transform`,
`filter`, `aggregate`, `zip_with`) — the embedding math never leaves
codegen. The fold order is left-to-right on both engines, so double
results are bit-comparable (elements cast to double first; the parquet
column is array<float>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, vec_dot, vec_norm
from ..sources import load_table
from . import register


@register(
    "array_basics",
    oracle="""
    SELECT vec_id,
           len(embedding)                                  AS emb_dim,
           CAST(embedding[1] AS DOUBLE)                    AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE)       AS last_val,
           len(list_filter(embedding, x -> x > 0))         AS n_pos,
           list_reduce(list_transform(embedding, x -> CAST(ABS(x) AS DOUBLE)),
                       (acc, x) -> acc + x)                AS l1_norm,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2),
                       (acc, x) -> acc + x)                AS sum_doubled
    FROM embeddings
    """,
    doc="array basics: size/element_at/filter/transform/aggregate (E36)",
    tags=("array",),
)
def array_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = as_double_array("embedding")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("emb_dim"),
        F.element_at(dbl, 1).alias("first_val"),
        F.element_at(dbl, F.size("embedding")).alias("last_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform(dbl, lambda x: F.abs(x)), F.lit(0.0), lambda acc, x: acc + x
        ).alias("l1_norm"),
        F.aggregate(
            F.transform(dbl, lambda x: x * 2), F.lit(0.0), lambda acc, x: acc + x
        ).alias("sum_doubled"),
    )


@register(
    "array_slice_sort",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS head4,
             list_sort(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)))
               AS head8_sorted,
             len(list_distinct(list_transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE), 1) AS DOUBLE)))) AS n_distinct_1dp
      FROM embeddings
    )
    SELECT vec_id, CAST(i AS BIGINT) AS dim_idx,
           head4[i] AS head4_val,
           head8_sorted[i] AS head8_sorted_val,
           n_distinct_1dp
    FROM s CROSS JOIN unnest(generate_series(1, 8)) AS t(i)
    ORDER BY vec_id, dim_idx
    """,
    doc="slice / sort_array / array_distinct (E36); floats rounded before "
    "the distinct so both engines bucket identically. Output is one row "
    "per (vec_id, dim 1..8) — head4_val NULL past position 4 — because "
    "ARRAY-typed final columns are banned registry-wide (driver "
    "canonicalizer can't sort list cells)",
    tags=("array",),
)
def array_slice_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = as_double_array("embedding")
    s = emb.select(
        "vec_id",
        F.slice(dbl, 1, 4).alias("head4"),
        F.sort_array(F.slice(dbl, 1, 8)).alias("head8_sorted"),
        F.size(
            F.array_distinct(F.transform(dbl, lambda x: F.round(x, 1)))
        ).alias("n_distinct_1dp"),
    )
    return (
        s.select(
            "vec_id",
            "head4",
            "head8_sorted",
            "n_distinct_1dp",
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i"),
        )
        .select(
            "vec_id",
            F.col("i").cast("long").alias("dim_idx"),
            F.try_element_at("head4", F.col("i")).alias("head4_val"),
            F.try_element_at("head8_sorted", F.col("i")).alias("head8_sorted_val"),
            "n_distinct_1dp",
        )
        .orderBy("vec_id", "dim_idx")
    )


@register(
    "array_explode_stats",
    oracle="""
    SELECT vec_id, dim_idx, dim_val
    FROM (
      SELECT vec_id,
             UNNEST(generate_series(1, len(embedding)))  AS dim_idx,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS dim_val
      FROM embeddings
    ) WHERE dim_idx <= 8
    """,
    doc="posexplode: vector -> (id, dim, value) rows — the unrolled layout "
    "for columnar vector analytics (E36)",
    tags=("array",),
)
def array_explode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode(as_double_array("embedding")))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("dim_idx"),
            F.col("col").alias("dim_val"),
        )
        .where(F.col("dim_idx") <= 8)
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           SQRT(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (acc, x) -> acc + x)) AS l2_norm,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                 (acc, x) -> acc + x)  AS comp_sum
    FROM embeddings
    """,
    doc="vector norms via JVM fold — no UDF (E12)",
    tags=("array", "similarity"),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        vec_norm("embedding").alias("l2_norm"),
        F.aggregate(
            as_double_array("embedding"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("comp_sum"),
    )


@register(
    "embedding_centroids",
    oracle="""
    WITH unrolled AS (
      SELECT label,
             UNNEST(generate_series(1, len(embedding))) AS dim_idx,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings
    )
    SELECT label, dim_idx,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*), 9) AS centroid_val
    FROM unrolled
    WHERE dim_idx <= 4
    GROUP BY label, dim_idx
    """,
    doc="per-label centroids via explode + exact-decimal mean — the "
    "k-means/IVF training primitive, shuffle is (labels × dims) rows (E12)",
    tags=("array", "similarity"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    unrolled = emb.select(
        "label", F.posexplode(as_double_array("embedding"))
    ).select("label", (F.col("pos") + 1).alias("dim_idx"), F.col("col").alias("v"))
    return (
        unrolled.where(F.col("dim_idx") <= 4)
        .groupBy("label", "dim_idx")
        .agg(
            # 9dp rounding: the decimal->double conversion differs in the
            # last bit across engines (int128 vs BigDecimal), visible at
            # sf0.1 sums — same policy as the k-means centroid means.
            F.round(
                F.sum(F.col("v").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("centroid_val")
        )
    )


@register(
    "embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, label, embedding,
             NULLIF(list_max(list_transform(embedding,
                     x -> ABS(CAST(x AS DOUBLE)))) / 127.0, 0.0) AS scale
      FROM embeddings
    )
    SELECT vec_id, label, ROUND(scale, 6) AS scale_r,
           CAST(list_reduce(list_transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE) / scale, 0) AS BIGINT)),
                 (a, b) -> a + b) AS BIGINT) AS q_sum,
           ROUND(list_reduce(list_transform(embedding,
                 x -> (CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / scale, 0) * scale)
                    * (CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / scale, 0) * scale)),
                 (a, b) -> a + b), 6) AS sq_err
    FROM s
    """,
    doc="symmetric int8 quantization of embeddings: per-vector scale = "
    "max|x|/127, quantized checksum + reconstruction squared error — "
    "the 4x storage shrink applied before shipping a 100 TB vector "
    "store; pure JVM folds, no UDF (E12/E36)",
    tags=("array", "similarity"),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    arr = as_double_array("embedding")
    scale = F.nullif(
        F.array_max(F.transform(arr, lambda x: F.abs(x))) / 127.0, F.lit(0.0)
    )
    emb = emb.withColumn("scale", scale)
    sc = F.col("scale")
    q = F.transform(arr, lambda x: F.round(x / sc, 0).cast("bigint"))
    dq_err = F.transform(
        arr,
        lambda x: (x - F.round(x / sc, 0) * sc) * (x - F.round(x / sc, 0) * sc),
    )
    return emb.select(
        "vec_id",
        "label",
        F.round(sc, 6).alias("scale_r"),
        F.aggregate(q, F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
            "q_sum"
        ),
        F.round(
            F.aggregate(dq_err, F.lit(0.0), lambda a, b: a + b), 6
        ).alias("sq_err"),
    )


@register(
    "embedding_dim_stats",
    oracle="""
    WITH u AS (
      SELECT UNNEST(generate_series(1, len(embedding))) AS dim_idx,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings
    ),
    g AS (
      SELECT dim_idx, COUNT(*) AS n,
             SUM(CAST(v AS DECIMAL(30,12))) AS s,
             SUM(CAST(v * v AS DECIMAL(30,12))) AS ss
      FROM u GROUP BY dim_idx
    )
    SELECT CAST(dim_idx AS BIGINT) AS dim_idx, n,
           ROUND(CAST(s AS DOUBLE) / n, 9) AS mean_val,
           ROUND(SQRT(GREATEST(
             CAST(ss AS DOUBLE) / n
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0)), 9)
             AS std_val
    FROM g ORDER BY dim_idx
    """,
    doc="per-dimension corpus mean/std (EXT, E12): the whitening / "
    "standardization statistics every embedding pipeline computes "
    "before centering (e.g. ahead of SemDeDup or PCA). posexplode to "
    "(dim, value), one keyed agg with exact-decimal sum and "
    "sum-of-squares so the result is partition-order independent, "
    "variance from the moments in double. At 100 TB: partial "
    "aggregation makes the shuffle carry |dims| x |partitions| rows "
    "— nothing scales with corpus size after the map side",
    tags=("array", "similarity"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select(
        F.posexplode(as_double_array("embedding")).alias("pos", "v")
    ).select((F.col("pos") + 1).cast("long").alias("dim_idx"), "v")
    g = u.groupBy("dim_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(30,12)")).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(30,12)")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    return g.select(
        "dim_idx",
        "n",
        F.round(mean, 9).alias("mean_val"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("ss").cast("double") / F.col("n") - mean * mean,
                    F.lit(0.0),
                )
            ),
            9,
        ).alias("std_val"),
    ).orderBy("dim_idx")
