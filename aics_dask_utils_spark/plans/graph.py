"""Graph-analytics plans (E62): oracle-checked iterative PageRank.

The nation-level trade graph is derived from the TPC-H-shaped star
schema (customer nation -> supplier nation, weighted by lineitem
count); PageRank runs as an iterative Spark loop while the DuckDB
oracle unrolls the identical rounds as CTE blocks — like the k-means
and connected-components plans, a whole iterative algorithm is
hash-compared, floats included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources import load_table
from . import register

_EDGE_CTE = """
    edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY src, dst
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)
"""


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    ctes = [_EDGE_CTE.strip()]
    ctes.append(
        "pr0 AS (SELECT node, ROUND(1.0 / n_nodes, 6) AS pr "
        "FROM nodes CROSS JOIN nn)"
    )
    for i in range(1, iters + 1):
        prev = f"pr{i - 1}"
        ctes.append(
            f"""c{i} AS (
      SELECT e.dst, CAST(SUM(CAST(p.pr * e.w / o.ow AS DECIMAL(30,12))) AS DOUBLE) AS contrib
      FROM edges e JOIN {prev} p ON e.src = p.node JOIN outw o ON e.src = o.src
      GROUP BY e.dst
    ),
    pr{i} AS (
      SELECT n.node,
             ROUND({1.0 - damping} / nn.n_nodes
                   + {damping} * COALESCE(c.contrib, 0.0), 6) AS pr
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst CROSS JOIN nn
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, pr FROM pr{iters}"
    )


@register(
    "graph_pagerank_nations",
    oracle=_pagerank_oracle(),
    doc="weighted PageRank (3 rounds, d=0.85) over the nation-level "
    "trade graph (customer nation -> supplier nation, lineitem-count "
    "weights). Iterative Spark loop — per round one edges x ranks join "
    "+ one by-dst aggregation, edges checkpointed once — vs an "
    "unrolled-CTE oracle; per-round decimal sums + 6dp rounding make "
    "the float iteration engine-reproducible (E62)",
    tags=("graph", "iterative"),
)
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, iters=3, damping=0.85)
