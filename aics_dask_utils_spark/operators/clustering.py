"""Deterministic distributed k-means (the IVF-cell trainer).

Lloyd iterations expressed as pure DataFrame algebra so every step is
engine-reproducible and the whole algorithm sits under the DuckDB
hash-check (see ``plans/clustering.py``):

- init: centroids = the k lowest-id vectors (seed-free, deterministic);
- assignment: dist²(v,c) = ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩ — three sequential
  dot-product folds, identical on any engine; ties broken by centroid
  id via a (dist2, cid) row_number;
- update: per-dimension mean via posexplode + exact DECIMAL(30,12)
  sums (order-independent), repacked with a sorted collect.

Scale shape: assignment is a broadcast cross join (k centroids are KBs)
+ one narrow pass over the vectors; the update shuffles (k × dims)
groups. Centroids never leave the cluster — the loop is lazy plans,
no driver collect. At real scale you'd run this over an IVF sample;
the loop skeleton is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import as_double_array, vec_dot


def kmeans_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vid, v) × (cid, c) -> (vid, v, cid).
    Broadcast cross join + dist² identity; ties break to the lowest cid."""
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "dist2",
        vec_dot("v", "v") - F.lit(2.0) * vec_dot("v", "c") + vec_dot("c", "c"),
    )
    w = W.partitionBy("vid").orderBy("dist2", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vid", "v", "cid")
    )


def kmeans_assign_topn(e: DataFrame, cent: DataFrame, n: int = 2) -> DataFrame:
    """Top-n nearest centroids per vector: (vid, v, cid, probe_rank)
    with probe_rank 1..n. The multi-probe half of an IVF index —
    probing the runner-up cell recovers the neighbors a hard
    single-cell assignment loses at cell boundaries (recall climbs at
    the cost of n× probe fan-out; the corpus itself stays
    single-assigned). Carries ``v`` through so probe-side consumers
    (semantic_screen_ivf's probed corpus) don't need a vid self-join
    to recover the vector."""
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "dist2",
        vec_dot("v", "v") - F.lit(2.0) * vec_dot("v", "c") + vec_dot("c", "c"),
    )
    w = W.partitionBy("vid").orderBy("dist2", "cid")
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= n)
        .select("vid", "v", "cid", "probe_rank")
    )


def _recompute_centroids(assign: DataFrame) -> DataFrame:
    dim_means = (
        assign.select("cid", F.posexplode("v"))
        .groupBy("cid", "pos")
        .agg(
            # Round each mean to 9 dp: decimal->double conversion differs
            # in the last bit across engines (int128 vs BigDecimal), and
            # raw means would leak that drift into the output centroids.
            F.round(
                F.sum(F.col("col").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("m")
        )
    )
    return dim_means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    train_limit: int | None = None,
) -> DataFrame:
    """Train the coarse quantizer: ``iters`` Lloyd rounds from the k
    lowest-id seeds. Returns (cid, c).

    ``train_limit``: when set, Lloyd trains ONLY on rows with
    ``vid < train_limit`` — the production bounded-sample recipe
    (FAISS trains coarse quantizers on ≤~1M vectors, not the corpus);
    without it every consumer pays ``iters`` full-corpus passes before
    the quantizer exists. Deterministic and oracle-mirrorable (one
    WHERE clause). Assignment of the full corpus against the trained
    centroids is the caller's (cheap, single-pass) job."""
    e = df.select(F.col(id_col).alias("vid"), as_double_array(vec_col).alias("v"))
    train = e.where(F.col("vid") < train_limit) if train_limit is not None else e
    cent = train.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iters):
        # k tiny rows; without the checkpoint every later broadcast of
        # cent re-executes ALL previous rounds (broadcast exchanges are
        # re-planned per consumer), making the loop quadratic in iters.
        cent = _recompute_centroids(kmeans_assign(train, cent)).localCheckpoint(
            eager=True
        )
    return cent


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns one row per cluster:
    (cid, n_vecs, centroid) — final assignment sizes and refreshed
    centroids."""
    e = df.select(F.col(id_col).alias("vid"), as_double_array(vec_col).alias("v"))
    cent = e.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("v").alias("c")
    )
    assign = None
    for _ in range(iters):
        assign = kmeans_assign(e, cent)
        cent = _recompute_centroids(assign).localCheckpoint(eager=True)
    sizes = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        sizes.join(cent, "cid")
        .select("cid", "n_vecs", F.col("c").alias("centroid"))
        .orderBy("cid")
    )
