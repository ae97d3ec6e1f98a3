"""Scale-up parity: heavy deterministic pipelines re-verified at sf0.1
(10x the driver gate). Slow — opt in with SPARK_GRAFT_SLOW=1."""

import os

import pytest

from aics_dask_utils_spark.testing import run_plan_vs_oracle

SLOW = os.environ.get("SPARK_GRAFT_SLOW") == "1"

HEAVY = [
    "dedup_minhash_lsh",
    "pipeline_clean_corpus",
    "graph_pagerank_nations",
    "kmeans_embeddings",
    "text_bm25_search",
    "pipeline_pack_sequences",
]


@pytest.mark.skipif(not SLOW, reason="set SPARK_GRAFT_SLOW=1 to run sf0.1 parity")
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_plan_parity_at_sf01(spark, name):
    run_plan_vs_oracle(spark, name, "/root/testdata/sf0.1")
