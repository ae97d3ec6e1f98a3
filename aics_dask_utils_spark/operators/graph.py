"""Graph-analytics operators beyond pair dedup: weighted PageRank.

Complements :func:`..operators.dedup.connected_components` (the other
iterative graph op). Same scale skeleton: the edge list is the only
big relation; each iteration is one shuffle join (edges x ranks on
src) + one aggregation (contributions by dst); the rank relation is
node-sized. Edges are checkpointed once so the (usually expensive)
edge derivation never re-executes per iteration, and lineage stays
flat. Per-iteration ranks are decimal-summed and rounded to 6 dp,
which makes the whole iterative float computation reproducible on any
engine — the DuckDB oracle unrolls the identical iterations as CTEs.

At 1000-executor scale: ranks broadcast when nodes << edges; skewed
high-in-degree nodes are the known hazard — salt the contribution
aggregation or use the standard split-high-degree-vertex trick; the
loop skeleton is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import dsum


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over a directed edge list, ``iters`` rounds.

    pr_0 = round(1/N, 6);
    pr_{i+1}(n) = round((1-d)/N + d * sum_in(pr_i(m) * w(m,n)/outw(m)), 6)

    (no dangling-mass redistribution — declared semantics, identical in
    the oracle). Returns (node, pr) for every node appearing as source
    or destination.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_rel = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = e.join(outw, "src")
    ranks = nodes.crossJoin(n_rel).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 6).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("pr") * F.col("w") / F.col("ow")).alias("c"))
            .groupBy("dst")
            .agg(dsum("c", scale=12).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(n_rel)
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce("contrib", F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return ranks
