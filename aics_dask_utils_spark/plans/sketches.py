"""Mergeable-sketch plans (E65 family): the 100 TB approximate path.

Sketches are THE scale pattern for distinct counts, heavy hitters and
quantiles: each partition/day/shard aggregates into a tiny mergeable
state (KB), partial states combine associatively (map-side combine,
cross-day rollup), and the full-data pass never re-runs. Spark 4.1
ships Apache DataSketches bindings natively:

- ``approx_top_k_accumulate / _combine / _estimate`` — mergeable
  frequent-items (heavy hitters);
- ``theta_sketch_agg / theta_intersection / theta_difference /
  theta_union`` — distinct-set ALGEBRA (intersection/difference
  cardinalities, which HLL cannot do);
- ``kll_sketch_agg_double / kll_sketch_merge_double /
  kll_sketch_get_quantile_double`` — mergeable quantiles.

Sketch binaries are engine-specific, so (like ``agg_hll_sketch``)
each plan's CHECKABLE contract emits the exact answer alongside a
boolean asserting the sketch estimate lands inside a tolerance band;
the DuckDB oracle computes the exact side and literal TRUE. Any
estimator drift hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from . import register


@register(
    "agg_topk_sketch",
    oracle="""
    SELECT event_type AS item,
           COUNT(*) AS est_count,
           TRUE AS count_exact
    FROM events GROUP BY event_type ORDER BY item
    """,
    doc="mergeable heavy-hitters sketch (E65 family): per-day "
    "approx_top_k_accumulate states combined with approx_top_k_combine "
    "across days, then estimated — the cross-shard frequent-items "
    "rollup (each day's state is ~KB; the recombine never rescans). "
    "With |distinct| (5 event types) far below the tracked-item "
    "budget (10) the DataSketches frequent-items estimate is PROVABLY "
    "exact, so the contract pins est_count to the true counts and "
    "count_exact asserts it in-plan; the oracle is the exact GROUP BY",
    tags=("sketch", "agg", "approx"),
)
def agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_sk_events")
    return spark.sql(
        """
        WITH daily AS (
          SELECT date_trunc('DAY', ts) AS d,
                 approx_top_k_accumulate(event_type, 10) AS st
          FROM _sk_events GROUP BY date_trunc('DAY', ts)
        ),
        comb AS (SELECT approx_top_k_combine(st) AS cs FROM daily),
        est AS (SELECT inline(approx_top_k_estimate(cs, 10)) FROM comb),
        exact AS (
          SELECT event_type, COUNT(*) AS n FROM _sk_events GROUP BY event_type
        )
        SELECT est.item,
               CAST(est.count AS BIGINT) AS est_count,
               est.count = exact.n AS count_exact
        FROM est JOIN exact ON est.item = exact.event_type
        ORDER BY est.item
        """
    )


@register(
    "agg_theta_users",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events WHERE value > 90)
    SELECT (SELECT COUNT(*) FROM a) AS exact_a,
           (SELECT COUNT(*) FROM b) AS exact_b,
           (SELECT COUNT(*) FROM a WHERE user_id IN (SELECT user_id FROM b))
             AS exact_inter,
           TRUE AS inter_ok, TRUE AS diff_ok, TRUE AS union_ok
    FROM (SELECT 1)
    """,
    doc="theta-sketch distinct-set algebra (E65 family): purchase "
    "users INTERSECT high-value users, plus difference and union "
    "cardinalities, from two theta_sketch_agg states built in ONE "
    "events scan (FILTER clauses) — set algebra HLL cannot express. "
    "At 100 TB: per-shard theta states union associatively; "
    "intersection/difference happen on the merged KB-sized states, "
    "never on the raw keys. Contract: exact sides (countDistinct) + "
    "booleans pinning each estimate within 5%; below ~4k distinct "
    "the sketch is in exact (sparse) mode so the bounds always hold",
    tags=("sketch", "agg", "approx"),
)
def agg_theta_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_sk_events")
    return spark.sql(
        """
        WITH sk AS (
          SELECT theta_sketch_agg(user_id)
                   FILTER (WHERE event_type = 'purchase') AS sa,
                 theta_sketch_agg(user_id) FILTER (WHERE value > 90) AS sb
          FROM _sk_events
        ),
        est AS (
          SELECT theta_sketch_estimate(theta_intersection(sa, sb)) AS e_inter,
                 theta_sketch_estimate(theta_difference(sa, sb)) AS e_diff,
                 theta_sketch_estimate(theta_union(sa, sb)) AS e_union
          FROM sk
        ),
        exact AS (
          SELECT COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                     THEN user_id END) AS exact_a,
                 COUNT(DISTINCT CASE WHEN value > 90 THEN user_id END) AS exact_b
          FROM _sk_events
        ),
        exact_i AS (
          SELECT COUNT(*) AS exact_inter FROM (
            SELECT user_id FROM _sk_events
            GROUP BY user_id
            HAVING MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AND MAX(CASE WHEN value > 90 THEN 1 ELSE 0 END) = 1)
        )
        SELECT exact_a, exact_b, exact_inter,
               abs(e_inter - exact_inter) <= 0.05 * exact_inter AS inter_ok,
               abs(e_diff - (exact_a - exact_inter))
                 <= 0.05 * greatest(exact_a - exact_inter, 1) AS diff_ok,
               abs(e_union - (exact_a + exact_b - exact_inter))
                 <= 0.05 * (exact_a + exact_b - exact_inter) AS union_ok
        FROM est, exact, exact_i
        """
    )


@register(
    "agg_kll_price_quantiles",
    oracle="""
    SELECT COUNT(*) AS n,
           TRUE AS median_ok, TRUE AS p90_ok
    FROM lineitem
    """,
    doc="mergeable KLL quantile sketch (E65 family): per-returnflag "
    "kll_sketch_agg_double states folded pairwise with "
    "kll_sketch_merge_double into one global sketch, then quantile "
    "queries — the 100 TB percentile pattern (per-shard sketches "
    "merge associatively; exact percentile would shuffle every "
    "value). Contract: the sketch median must land inside the exact "
    "p40–p60 band and the sketch p90 inside the exact p85–p95 band "
    "(KLL k=200 rank error ~1.7% ≪ band width, so the booleans are "
    "stable even under randomized compaction); oracle = row count + "
    "literal TRUE",
    tags=("sketch", "agg", "approx"),
)
def agg_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_sk_lineitem")
    return spark.sql(
        """
        WITH per AS (
          SELECT l_returnflag,
                 kll_sketch_agg_double(l_extendedprice) AS sk
          FROM _sk_lineitem GROUP BY l_returnflag
        ),
        folded AS (
          SELECT reduce(
                   slice(arr, 2, size(arr) - 1), arr[0],
                   (a, x) -> kll_sketch_merge_double(a, x)) AS g
          FROM (SELECT transform(
                  array_sort(collect_list(struct(l_returnflag, sk))),
                  p -> p.sk) AS arr
                FROM per)
        ),
        est AS (
          SELECT kll_sketch_get_quantile_double(g, 0.5) AS med,
                 kll_sketch_get_quantile_double(g, 0.9) AS p90
          FROM folded
        ),
        exact AS (
          SELECT COUNT(*) AS n,
                 percentile(l_extendedprice, 0.40) AS p40,
                 percentile(l_extendedprice, 0.60) AS p60,
                 percentile(l_extendedprice, 0.85) AS p85,
                 percentile(l_extendedprice, 0.95) AS p95
          FROM _sk_lineitem
        )
        SELECT n,
               med BETWEEN p40 AND p60 AS median_ok,
               p90 BETWEEN p85 AND p95 AS p90_ok
        FROM est, exact
        """
    )


@register(
    "events_sliding_distinct_hll",
    oracle="""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM e),
    ex AS (
      SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_w7
      FROM days d JOIN e ON e.day >= d.day - 6 AND e.day <= d.day
      GROUP BY d.day
    ),
    daily AS (
      SELECT day, COUNT(DISTINCT user_id) AS day_users FROM e GROUP BY day
    )
    SELECT daily.day, day_users, exact_w7, TRUE AS w7_ok
    FROM daily JOIN ex ON daily.day = ex.day
    ORDER BY daily.day
    """,
    doc="7-day sliding distinct users via windowed HLL union (E65 x "
    "E42): per-day hll_sketch_agg states, then hll_union_agg as a "
    "WINDOW aggregate over a 6-PRECEDING frame — the production "
    "sliding-MAU/WAU pattern. Sliding distinct is NOT decomposable "
    "(yesterday's users overlap today's), so the exact form rescans "
    "the window every day; sketches make it one tiny state merge per "
    "frame. At 100 TB the daily sketch build is the only full scan; "
    "the slide touches |days| KB-sized states. Contract: exact "
    "windowed distinct (via a day-range join, contract-side only) + "
    "boolean pinning the estimate within 5%; oracle = exact + TRUE",
    tags=("sketch", "events", "window", "approx"),
)
def events_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_sk_events")
    return spark.sql(
        """
        WITH e AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
          FROM _sk_events
        ),
        daily AS (
          SELECT day, hll_sketch_agg(user_id) AS sk,
                 COUNT(DISTINCT user_id) AS day_users
          FROM e GROUP BY day
        ),
        est AS (
          SELECT day, day_users,
                 hll_sketch_estimate(hll_union_agg(sk) OVER
                   (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                   AS est_w7
          FROM daily
        ),
        ex AS (
          SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_w7
          FROM (SELECT DISTINCT day FROM e) d
          JOIN e ON e.day >= date_sub(d.day, 6) AND e.day <= d.day
          GROUP BY d.day
        )
        SELECT est.day, day_users, exact_w7,
               abs(est_w7 - exact_w7) <= 0.05 * exact_w7 AS w7_ok
        FROM est JOIN ex ON est.day = ex.day
        ORDER BY est.day
        """
    )


@register(
    "events_sliding_topk_sketch",
    oracle="""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type FROM events
    ),
    days AS (SELECT DISTINCT day FROM e),
    ex AS (
      SELECT d.day, e.event_type AS item, COUNT(*) AS est_count
      FROM days d JOIN e ON e.day >= d.day - 2 AND e.day <= d.day
      GROUP BY d.day, e.event_type
    )
    SELECT day, item, est_count, TRUE AS count_exact
    FROM ex ORDER BY day, item
    """,
    doc="3-day sliding frequent-items via windowed sketch combine "
    "(E65 x E42): per-day approx_top_k_accumulate states merged by "
    "approx_top_k_combine OVER a 2-PRECEDING frame — the trending-"
    "items pattern (sliding heavy hitters are as non-decomposable as "
    "sliding distinct; the sketch slide touches |days| KB states, "
    "never re-scans). Tracked budget (10) exceeds |event types| (5), "
    "so DataSketches counts are provably exact: the contract emits "
    "every item's windowed estimate, asserts equality with the exact "
    "sliding count in-plan, and the oracle recomputes exact + TRUE — "
    "no reliance on tie order inside the sketch's ranking",
    tags=("sketch", "events", "window", "approx"),
)
def events_sliding_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_sk_events")
    return spark.sql(
        """
        WITH e AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type
          FROM _sk_events
        ),
        daily AS (
          SELECT day, approx_top_k_accumulate(event_type, 10) AS st
          FROM e GROUP BY day
        ),
        slid AS (
          SELECT day, approx_top_k_combine(st) OVER
                   (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cs
          FROM daily
        ),
        est AS (
          SELECT day, inline(approx_top_k_estimate(cs, 10)) FROM slid
        ),
        ex AS (
          SELECT d.day, e.event_type AS item, COUNT(*) AS n
          FROM (SELECT DISTINCT day FROM e) d
          JOIN e ON e.day >= date_sub(d.day, 2) AND e.day <= d.day
          GROUP BY d.day, e.event_type
        )
        SELECT est.day, est.item,
               CAST(est.count AS BIGINT) AS est_count,
               est.count = ex.n AS count_exact
        FROM est JOIN ex ON est.day = ex.day AND est.item = ex.item
        ORDER BY est.day, est.item
        """
    )


@register(
    "agg_cms_heavy_hitters",
    oracle="""
    SELECT p_brand, CAST(n AS BIGINT) AS n_exact, TRUE AS cms_ok
    FROM (
      SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
      ORDER BY n DESC, p_brand LIMIT 5
    ) ORDER BY n_exact DESC, p_brand
    """,
    doc="count-min-sketch heavy-hitter verification (E65, the 5th "
    "sketch type): one pass builds a CMS over p_brand "
    "(count_min_sketch agg — mergeable, map-side combined, KB-sized "
    "state), the top-5 brands come from an exact keyed count, and for "
    "each the plan asserts the CMS point-query obeys its guarantee "
    "exact <= est <= exact + eps*N (eps=1e-4). The sketch binary and "
    "the 25-row brand relation are the ONLY driver-side materials "
    "(documented queries-only collect, like similarity.py); at 100 TB "
    "the same one-pass CMS answers ad-hoc 'how often does X occur' "
    "without a second scan. Oracle = exact top-5 + literal TRUE",
    tags=("sketch", "agg"),
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    eps, conf, seed = 1e-4, 0.99, 42
    part = load_table(spark, sf_dir, "part")
    # HARD small-domain contract, not just documentation: the exact
    # top-5 and the CMS probes run driver-side, which is only sound
    # because p_brand has ~25 values. The guard must run BEFORE the
    # collect (a post-collect check cannot prevent the driver OOM it
    # exists to prevent) and must itself be bounded: distinct().limit()
    # ships at most 1001 keys regardless of the true cardinality.
    n_keys = part.select("p_brand").distinct().limit(1001).count()
    if n_keys > 1000:
        raise ValueError(
            "agg_cms_heavy_hitters collects the keyed-count relation "
            "driver-side and probes the CMS in the driver JVM; that "
            "contract holds only for small key domains "
            "(>1000 distinct keys found). For high-cardinality keys "
            "use approx_top_k (distributed) instead."
        )
    brand_counts = (
        part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    exact = sorted(brand_counts, key=lambda r: (-r["n"], r["p_brand"]))[:5]
    n_total = sum(r["n"] for r in brand_counts)
    sk_row = part.agg(
        F.expr(
            f"count_min_sketch(p_brand, {eps}d, {conf}d, {seed})"
        ).alias("sk")
    ).head()
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    slack = eps * n_total
    rows = [
        (
            r["p_brand"],
            int(r["n"]),
            bool(r["n"] <= cms.estimateCount(r["p_brand"]) <= r["n"] + slack),
        )
        for r in exact
    ]
    out = spark.createDataFrame(rows, "p_brand string, n_exact long, cms_ok boolean")
    return out.orderBy(F.desc("n_exact"), "p_brand")
