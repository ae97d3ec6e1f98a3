"""Determinism across partition counts: the same plan must produce the
IDENTICAL result set whether the shuffle runs at 3 or 32 partitions —
the property that makes results stable under cluster resizing,
AQE re-planning, and retries. shuffle.partitions is a runtime conf, so
we flip it per run on one session."""

import pytest

from aics_dask_utils_spark.plans import all_plans

PLANS = [
    "dedup_minhash_lsh",
    "sample_bernoulli",
    "sample_weighted_topk",
    "graph_pagerank_nations",
    "agg_stats",
    "text_bm25_search",
    "embedding_dim_stats",
    "graph_label_propagation",
    "events_markov_transitions",
    "text_chunk_sliding",
    "events_sliding_distinct_hll",
    "sample_bootstrap_ci",
    # round-3 additions whose docstrings CLAIM partitioning-independence
    # (exact-decimal OLS moments; pinned-order MI fold; partial-state
    # rollup merge) — claims get proved here, not asserted in prose
    "agg_regression_per_group",
    "agg_mutual_info",
    "agg_two_level_rollup",
]


def _rows(spark, name, sf_dir, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = all_plans()[name].fn(spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", PLANS)
def test_result_invariant_under_partition_count(spark, sf_dir, name):
    assert _rows(spark, name, sf_dir, 3) == _rows(spark, name, sf_dir, 32)
