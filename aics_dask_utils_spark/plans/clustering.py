"""Oracle-checked distributed k-means (E12/E40 trainer).

The DuckDB oracle unrolls the same Lloyd iterations as CTE blocks —
assignment by the ⟨v,v⟩−2⟨v,c⟩+⟨c,c⟩ identity (three sequential
``list_dot_product`` folds, bit-matching Spark's ``F.aggregate``
folds), update by exact-decimal per-dimension means — so a whole
iterative ML algorithm, centroid floats included, is hash-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.clustering import kmeans_fit_predict
from ..sources import load_table
from . import register


def _kmeans_oracle(k: int = 4, iters: int = 2) -> str:
    ctes = [
        "e AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT vid AS cid, v AS c FROM e WHERE vid < {k})",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""s{i} AS (
      SELECT e.vid, e.v, c.cid,
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
               + list_dot_product(c.c, c.c) AS dist2
      FROM e CROSS JOIN {prev} c
    )"""
        )
        ctes.append(
            f"""a{i} AS (
      SELECT vid, v, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist2, cid) AS rn
        FROM s{i}
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""x{i} AS (
      SELECT cid,
             UNNEST(generate_series(1, len(v))) AS pos,
             UNNEST(v) AS val
      FROM a{i}
    )"""
        )
        ctes.append(
            f"""m{i} AS (
      SELECT cid, pos,
             CAST(SUM(CAST(val AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
      FROM x{i} GROUP BY cid, pos
    )"""
        )
        ctes.append(
            f"c{i} AS (SELECT cid, list(m ORDER BY pos) AS c FROM m{i} GROUP BY cid)"
        )
        prev = f"c{i}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT z.cid, z.n_vecs, c.c AS centroid
    FROM (SELECT cid, COUNT(*) AS n_vecs FROM a{iters} GROUP BY cid) z
    JOIN c{iters} c USING (cid)
    ORDER BY z.cid
    """


@register(
    "kmeans_embeddings",
    oracle=_kmeans_oracle(k=4, iters=2),
    doc="deterministic k-means over embeddings (k=4, 2 Lloyd iterations): "
    "broadcast-cross-join assignment (dot-product identity), exact-"
    "decimal per-dim mean update — an iterative ML trainer whose "
    "centroid doubles hash-match the unrolled SQL oracle (E12,E40)",
    tags=("similarity", "iterative"),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit_predict(emb, "vec_id", "embedding", k=4, iters=2)
