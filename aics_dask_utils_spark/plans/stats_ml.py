"""Round-7 statistics/ML-evaluation/quality/spatial plans (E70, E74-E76).

The "is the data/model healthy" tier of a 100 TB pipeline, all built on
the module-wide scale shape of :mod:`..operators.stats`: one keyed scan
with map-side partials collapses the data to a grid that is tiny BY
CONSTRUCTION (histogram cells, contingency cells, daily counts,
constraint metrics), and the statistic derives in closed form from the
grid with pinned-order folds for every double accumulation. Nothing
here ranks or sorts raw rows globally, nothing cross-joins, and no
relation carries a forced broadcast hint (the grids are AQE's call).

Oracles mirror the Spark arithmetic token-for-token (same clamp
orders, same fold orders, same decimal casts) so results hash
bit-identically across engines; every plan was pre-validated at
sf0.001/0.01/0.1 before registration (round-7 window slots).

The reference (`/root/reference/aics_dask_utils/distributed_handler.py`
— a 196-line Dask map/gather wrapper) has no statistics, evaluation,
quality, or spatial surface; these are EXT capabilities of the
large-scale-pipeline north star (SURVEY §2b).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register

# DuckDB view of events with Spark's µs truncation applied (mirrors
# plans/events_windows.py).
_EV = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events)"
)


@register(
    "events_kruskal_wallis",
    oracle="""
    WITH e AS (
      SELECT event_type AS grp,
             CAST(LEAST(GREATEST(FLOOR(value / 5.0), 0), 99) AS INT) AS bin
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    cells AS (SELECT grp, bin, COUNT(*) AS c FROM e GROUP BY grp, bin),
    bins AS (SELECT bin, SUM(c) AS t FROM cells GROUP BY bin),
    m AS (
      SELECT bin, t,
             COALESCE(SUM(t) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumb
      FROM bins
    ),
    g AS (
      SELECT c.grp,
             CAST(SUM(c.c) AS BIGINT) AS n_g,
             CAST(SUM(c.c * (2 * m.cumb + m.t + 1)) AS BIGINT) AS r2
      FROM cells c JOIN m ON c.bin = m.bin GROUP BY c.grp
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total FROM g),
    s AS (
      SELECT list_reduce([0.0] || list(
               (CAST(r2 AS DOUBLE) / 2.0) * (CAST(r2 AS DOUBLE) / 2.0)
               / CAST(n_g AS DOUBLE) ORDER BY grp),
             (a, x) -> a + x) AS s
      FROM g
    ),
    ties AS (
      SELECT list_reduce([0.0] || list(
               pow(CAST(t AS DOUBLE), 3) - CAST(t AS DOUBLE) ORDER BY bin),
             (a, x) -> a + x) AS tie
      FROM m
    )
    SELECT tot.n_groups, tot.n_total,
           CAST(tot.n_groups - 1 AS BIGINT) AS dof,
           ROUND(12.0 * s.s
                 / (CAST(tot.n_total AS DOUBLE) * (tot.n_total + 1.0))
                 - 3.0 * (tot.n_total + 1.0), 6) AS h_stat,
           ROUND((12.0 * s.s
                  / (CAST(tot.n_total AS DOUBLE) * (tot.n_total + 1.0))
                  - 3.0 * (tot.n_total + 1.0))
                 / (1.0 - ties.tie
                    / (pow(CAST(tot.n_total AS DOUBLE), 3) - tot.n_total)),
                 6) AS h_tie_corrected
    FROM tot CROSS JOIN s CROSS JOIN ties
    """,
    doc="binned k-group Kruskal-Wallis H (value ranked across ALL five "
    "event types) with tie correction: one-way ANOVA on ranks, the "
    "k-group generalization of events_mann_whitney. Ranks collapse "
    "onto the pinned 100-cell grid (each cell one midrank tie group) "
    "and are carried as TWICE-midranks so every per-group rank sum is "
    "an exact integer; one (group,bin) keyed scan, one <=100-row "
    "pinned-order cumulative fold, closed-form H over the <=k group "
    "rows. Shuffled state is k*100 cells at any data size "
    "(EXT stats/experimentation)",
    tags=("events", "agg", "stats"),
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import kruskal_wallis

    ev = load_table(spark, sf_dir, "events")
    return kruskal_wallis(ev, "value", "event_type", bin_width=5.0, n_bins=100)


@register(
    "events_chi2_independence",
    oracle=f"""
    WITH e AS (
      SELECT event_type AS r,
             CAST(dayofweek(ts) + 1 AS INT) AS cc
      FROM {_EV}
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ),
    cells AS (SELECT r, cc, COUNT(*) AS o FROM e GROUP BY r, cc),
    rt AS (SELECT r, SUM(o) AS rtot FROM cells GROUP BY r),
    ct AS (SELECT cc, SUM(o) AS ctot FROM cells GROUP BY cc),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cells),
    j AS (
      SELECT cells.r, cells.cc, cells.o, rt.rtot, ct.ctot, tot.n_total
      FROM cells JOIN rt USING (r) JOIN ct USING (cc) CROSS JOIN tot
    ),
    terms AS (
      SELECT r, cc, n_total,
             pow(CAST(o AS DOUBLE)
                 - CAST(rtot AS DOUBLE) * ctot / n_total, 2)
             / (CAST(rtot AS DOUBLE) * ctot / n_total) AS term,
             CAST(rtot AS DOUBLE) * ctot / n_total AS e
      FROM j
    ),
    agg AS (
      SELECT MAX(n_total) AS n_total,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT cc) AS BIGINT) AS n_cols,
             list_reduce([0.0] || list(term ORDER BY r, cc),
                         (a, x) -> a + x) AS chi_occ,
             list_reduce([0.0] || list(e ORDER BY r, cc),
                         (a, x) -> a + x) AS e_occ
      FROM terms
    )
    SELECT n_total, n_rows, n_cols,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           ROUND(chi_occ + CAST(n_total AS DOUBLE) - e_occ, 6) AS chi2,
           ROUND(sqrt((chi_occ + CAST(n_total AS DOUBLE) - e_occ)
                      / (CAST(n_total AS DOUBLE)
                         * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE))),
                 6) AS cramers_v
    FROM agg
    """,
    doc="chi-squared test of independence (event_type x day-of-week) "
    "plus Cramér's V effect size: one (row,col) keyed scan collapses "
    "to the R x C contingency grid, margins join back grid-sized "
    "(AQE-broadcast, no hints), (o-e)^2/e folds in pinned (row,col) "
    "order; empty cells contribute via the closed form "
    "N - sum_occupied(e) so no dense grid is materialized. Spark "
    "dayofweek is 1=Sunday..7=Saturday; the oracle's 0-based "
    "dayofweek is shifted +1 to match (EXT stats)",
    tags=("events", "agg", "stats"),
)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import chi2_independence

    ev = load_table(spark, sf_dir, "events")
    return chi2_independence(
        ev.withColumn("dow", F.dayofweek("ts")), "event_type", "dow"
    )


#: Deterministic score used by the classifier-eval plans: a logistic
#: transform of `value` centred at 50 — NOT a trained model, just a
#: reproducible score column the evaluation machinery can be verified
#: against (the testdata has no model output column).
_SCORE_SQL = "1.0 / (1.0 + exp(-((value - 50.0) / 25.0)))"


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-((F.col("value") - F.lit(50.0)) / F.lit(25.0)))
            )
        ).alias("score"),
        F.col("event_type").isin("purchase", "signup").alias("label"),
    )


@register(
    "events_classifier_eval",
    oracle=f"""
    WITH sc AS (
      SELECT {_SCORE_SQL} AS s0,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    cl AS (SELECT LEAST(GREATEST(s0, 0.0), 1.0) AS s, y FROM sc),
    b AS (
      SELECT CAST(LEAST(GREATEST(FLOOR(s * 1000.0), 0), 999) AS INT) AS bin,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg,
             SUM(CAST(pow(s - CAST(y AS DOUBLE), 2)
                      AS DECIMAL(30,12))) AS brier_part,
             SUM(CAST(-(CAST(y AS DOUBLE)
                        * ln(LEAST(GREATEST(s, 1e-15), 1.0 - 1e-15))
                        + (1.0 - CAST(y AS DOUBLE))
                        * ln(1.0 - LEAST(GREATEST(s, 1e-15), 1.0 - 1e-15)))
                      AS DECIMAL(30,12))) AS ll_part
      FROM cl GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(SUM(brier_part) AS DOUBLE) AS brier_sum,
             CAST(SUM(ll_part) AS DOUBLE) AS ll_sum
      FROM b
    ),
    c AS (
      SELECT bin, pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg_before
      FROM b
    ),
    u AS (
      SELECT list_reduce([0.0] || list(
               CAST(pos AS DOUBLE)
               * (CAST(cum_neg_before AS DOUBLE)
                  + CAST(neg AS DOUBLE) / 2.0)
               ORDER BY bin), (a, x) -> a + x) AS u_raw
      FROM c
    )
    SELECT t.n_pos, t.n_neg,
           ROUND(u.u_raw / (CAST(t.n_pos AS DOUBLE) * t.n_neg), 6) AS auc,
           ROUND(t.brier_sum
                 / CAST(t.n_pos + t.n_neg AS DOUBLE), 6) AS brier,
           ROUND(t.ll_sum
                 / CAST(t.n_pos + t.n_neg AS DOUBLE), 6) AS logloss
    FROM t CROSS JOIN u
    """,
    doc="binary-classifier evaluation in ONE scan — AUC, Brier score, "
    "log-loss — over a deterministic logistic score of `value` with "
    "label = purchase/signup. AUC is the binned midrank rank-sum "
    "(1000-cell pinned grid, same tie treatment as "
    "events_mann_whitney); Brier and log-loss accumulate as exact "
    "decimals inside the same per-bin partials, so the whole "
    "evaluation is one keyed scan whose shuffled state is 1000 cells "
    "at any data size — the affordable shape for scoring a model over "
    "a 100 TB eval corpus (EXT stats/model evaluation; operator "
    "operators/stats.py:binary_classifier_eval)",
    tags=("events", "agg", "stats"),
)
def events_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import binary_classifier_eval

    return binary_classifier_eval(
        _scored(spark, sf_dir), "score", "label", n_bins=1000
    )


@register(
    "events_calibration_bins",
    oracle=f"""
    WITH sc AS (
      SELECT {_SCORE_SQL} AS s0,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    cl AS (SELECT LEAST(GREATEST(s0, 0.0), 1.0) AS s, y FROM sc)
    SELECT CAST(LEAST(GREATEST(FLOOR(s * 10.0), 0), 9) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(s AS DECIMAL(30,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos
    FROM cl GROUP BY 1 ORDER BY 1
    """,
    doc="reliability-diagram bins for the same deterministic logistic "
    "score: per score-decile count, exact-decimal mean predicted "
    "probability, and observed positive rate — the companion "
    "diagnostic to events_classifier_eval (calibrated model: "
    "mean_score ~= frac_pos per bin). One keyed scan with map-side "
    "partials onto <=10 cells (EXT stats/model evaluation; operator "
    "operators/stats.py:calibration_bins)",
    tags=("events", "agg", "stats"),
)
def events_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import calibration_bins

    return calibration_bins(_scored(spark, sf_dir), "score", "label", n_bins=10)


@register(
    "events_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {_EV}
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT a.event_type, l.lag, a.x AS xa, b.x AS xb
      FROM daily a
      CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) l(lag)
      JOIN daily b
        ON b.event_type = a.event_type AND b.d = a.d - l.lag
    ),
    m AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(xa AS DECIMAL(19,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(xb AS DECIMAL(19,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xa AS DECIMAL(19,0))
                      * CAST(xb AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xa AS DECIMAL(19,0))
                      * CAST(xa AS DECIMAL(19,0))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(xb AS DECIMAL(19,0))
                      * CAST(xb AS DECIMAL(19,0))) AS DOUBLE) AS sy2
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS INT) AS lag, n_pairs,
           ROUND((n_pairs * sxy - sx * sy)
                 / (sqrt(n_pairs * sx2 - sx * sx)
                    * sqrt(n_pairs * sy2 - sy * sy)), 6) AS acf
    FROM m ORDER BY event_type, lag
    """,
    doc="autocorrelation function of each event type's daily count "
    "series at lags 1..7 (the weekly-seasonality diagnostic): the raw "
    "events collapse to a (type, day) count grid in one keyed scan — "
    "time-proportional, NOT data-proportional — then a keyed self-join "
    "per lag aligns (x_t, x_t-lag) pairs and Pearson r derives from "
    "exact decimal moments (counts squared stay exact far beyond "
    "int64), NULL on degenerate constant series via try_divide. At "
    "100 TB only the tiny daily grid is ever joined (EXT stats/"
    "time series)",
    tags=("events", "agg", "stats"),
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    # Persist the tiny (type, day) grid: both sides of the lag self-join
    # consume it, and without persistence the lineage duplicates and the
    # FACT table is scanned twice — the one cost that matters at 100 TB
    # (the grid itself is time-proportional, a few KB per year).
    daily = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = daily.select(
        "event_type",
        "d",
        "x",
        F.explode(F.array(*[F.lit(i) for i in range(1, 8)])).alias("lag"),
    ).alias("a")
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("x").alias("bx"),
    ).alias("b")
    xa = F.col("x").cast("decimal(19,0)")
    xb = F.col("bx").cast("decimal(19,0)")
    m = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bd") == F.date_sub(F.col("d"), F.col("lag"))),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(xa).cast("double").alias("sx"),
            F.sum(xb).cast("double").alias("sy"),
            F.sum(xa * xb).cast("double").alias("sxy"),
            F.sum(xa * xa).cast("double").alias("sx2"),
            F.sum(xb * xb).cast("double").alias("sy2"),
        )
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n_pairs") * F.col("sx2") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n_pairs") * F.col("sy2") - F.col("sy") * F.col("sy"))
    return m.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.round(F.try_divide(num, den), 6).alias("acf"),
    ).orderBy("event_type", "lag")


@register(
    "pipeline_quality_checks",
    oracle="""
    WITH m AS (
      SELECT
        CAST(COUNT(text) AS DOUBLE) / COUNT(*) AS m0,
        CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(*) AS m1,
        CAST(SUM(CASE WHEN lang IN ('en','de','es','fr','zh')
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS m2,
        CAST(MIN(n_chars) AS DOUBLE) AS m3,
        CAST(MAX(n_chars) AS DOUBLE) AS m4,
        CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS m5,
        CAST(COUNT(source) AS DOUBLE) / COUNT(*) AS m6
      FROM documents
    )
    SELECT * FROM (
      SELECT 'completeness_text' AS "check", ROUND(m0, 6) AS metric,
             0.99 AS lo, 1.0 AS hi,
             COALESCE(m0 >= 0.99 AND m0 <= 1.0, FALSE) AS passed FROM m
      UNION ALL
      SELECT 'uniqueness_doc_id', ROUND(m1, 6), 1.0, 1.0,
             COALESCE(m1 >= 1.0 AND m1 <= 1.0, FALSE) FROM m
      UNION ALL
      SELECT 'lang_containment', ROUND(m2, 6), 0.95, 1.0,
             COALESCE(m2 >= 0.95 AND m2 <= 1.0, FALSE) FROM m
      UNION ALL
      SELECT 'min_n_chars', ROUND(m3, 6), 1.0, 1000000000.0,
             COALESCE(m3 >= 1.0 AND m3 <= 1000000000.0, FALSE) FROM m
      UNION ALL
      SELECT 'max_n_chars', ROUND(m4, 6), 0.0, 100000.0,
             COALESCE(m4 >= 0.0 AND m4 <= 100000.0, FALSE) FROM m
      UNION ALL
      SELECT 'mean_n_chars', ROUND(m5, 6), 10.0, 20000.0,
             COALESCE(m5 >= 10.0 AND m5 <= 20000.0, FALSE) FROM m
      UNION ALL
      SELECT 'completeness_source', ROUND(m6, 6), 0.99, 1.0,
             COALESCE(m6 >= 0.99 AND m6 <= 1.0, FALSE) FROM m
    ) ORDER BY "check"
    """,
    doc="Deequ-style declarative data-quality gate on `documents`: "
    "seven named constraints (completeness, key uniqueness, value "
    "containment, bounds, mean range) evaluated in ONE scan — every "
    "constraint reduces to a scalar metric from the same aggregate "
    "pass (count-distinct adds an Expand, still one pass) and the "
    "verdict is a range predicate on the metric, NULL failing closed. "
    "All metrics are ratios/extrema of exact integer counts, so the "
    "verdict table is partition- and engine-deterministic. At 100 TB "
    "this is the per-ingest-batch publish gate (EXT quality; operator "
    "operators/quality.py:check_suite, model: Schelter et al., VLDB "
    "2018)",
    tags=("documents", "quality"),
)
def pipeline_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        check_suite,
        completeness,
        containment,
        uniqueness,
    )

    docs = load_table(spark, sf_dir, "documents")
    checks = [
        ("completeness_text", completeness("text"), 0.99, 1.0),
        ("uniqueness_doc_id", uniqueness("doc_id"), 1.0, 1.0),
        (
            "lang_containment",
            containment("lang", ["en", "de", "es", "fr", "zh"]),
            0.95,
            1.0,
        ),
        ("min_n_chars", F.min("n_chars"), 1.0, 1_000_000_000.0),
        ("max_n_chars", F.max("n_chars"), 0.0, 100_000.0),
        (
            "mean_n_chars",
            F.sum("n_chars") / F.count(F.lit(1)),
            10.0,
            20_000.0,
        ),
        ("completeness_source", completeness("source"), 0.99, 1.0),
    ]
    return check_suite(docs, checks).orderBy("check")


# Cell edge for the 100 km radius join: the guarantee that any pair
# within R km is <= 1 cell apart needs the edge >= R in LONGITUDE
# degrees at the extreme latitude of the data (|lat| < 60 by
# construction of the derived coordinates below).
_GEO_RADIUS_KM = 100.0
_GEO_MAX_ABS_LAT = 60.0
_GEO_CELL_DEG = _GEO_RADIUS_KM / (
    111.19492664455873 * math.cos(math.radians(_GEO_MAX_ABS_LAT))
)


@register(
    "geo_radius_join",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid,
             (value % 120.0) - 60.0 AS lat,
             CAST((user_id * 7) % 360 AS DOUBLE) - 180.0 AS lon
      FROM events
      WHERE event_type = 'signup' AND event_id IS NOT NULL
        AND value IS NOT NULL AND user_id IS NOT NULL
        AND ABS((value % 120.0) - 60.0) <= {_GEO_MAX_ABS_LAT!r}
    ),
    c AS (
      SELECT pid, lat, lon,
             CAST(FLOOR(lat / {_GEO_CELL_DEG!r}) AS BIGINT) AS cy,
             CAST(FLOOR(lon / {_GEO_CELL_DEG!r}) AS BIGINT) AS cx
      FROM p
    ),
    l AS (
      SELECT pid AS id_a, lat AS lat_a, lon AS lon_a,
             cy + dy.o AS jy, cx + dx.o AS jx
      FROM c
      CROSS JOIN (VALUES (-1),(0),(1)) dy(o)
      CROSS JOIN (VALUES (-1),(0),(1)) dx(o)
    ),
    r AS (
      SELECT pid AS id_b, lat AS lat_b, lon AS lon_b,
             cy AS jy, cx AS jx
      FROM c
    ),
    d AS (
      SELECT id_a, id_b,
             2.0 * 6371.0088 * asin(LEAST(sqrt(
               pow(sin(radians(lat_b - lat_a) / 2), 2)
               + cos(radians(lat_a)) * cos(radians(lat_b))
               * pow(sin(radians(lon_b - lon_a) / 2), 2)), 1.0)) AS dist
      FROM l JOIN r USING (jy, jx)
      WHERE id_a < id_b
    )
    SELECT id_a, id_b, ROUND(dist, 6) AS dist_km
    FROM d WHERE dist <= 100.0
    ORDER BY id_a, id_b
    """,
    doc="spatial radius self-join — all signup-event pairs within "
    "100 km on coordinates derived deterministically from "
    "(value, user_id) (the testdata has no geo columns; the OPERATOR "
    "is the capability). Never a cross join: points quantize onto a "
    "square grid whose cell edge covers the radius at the worst-case "
    "latitude, the left side explodes to its 3x3 neighborhood (fixed "
    "x9, linear), one cell-keyed equi-join meets each qualifying pair "
    "exactly once, and the exact haversine predicate verifies. The "
    "only shuffle is the cell equi-join; dense-cell skew is AQE's "
    "skew-join case, and at 100 TB the cell id is the write-time "
    "partition key for a co-located join (EXT spatial; operator "
    "operators/geo.py:radius_self_join)",
    tags=("events", "join", "geo"),
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.geo import radius_self_join

    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("pid"),
        ((F.col("value") % F.lit(120.0)) - F.lit(60.0)).alias("lat"),
        (
            ((F.col("user_id") * F.lit(7)) % F.lit(360)).cast("double")
            - F.lit(180.0)
        ).alias("lon"),
    )
    return radius_self_join(
        pts,
        "pid",
        "lat",
        "lon",
        _GEO_RADIUS_KM,
        max_abs_lat=_GEO_MAX_ABS_LAT,
    ).orderBy("id_a", "id_b")


@register(
    "agg_gini_customer_revenue",
    oracle="""
    WITH t AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY o_custkey
    ),
    r AS (
      SELECT total,
             ROW_NUMBER() OVER (ORDER BY total, o_custkey) AS i
      FROM t
    ),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(total) AS s0,
             SUM(i * total) AS s1
      FROM r
    )
    SELECT n_customers,
           ROUND(CAST(s0 AS DOUBLE), 2) AS total_revenue,
           ROUND(2.0 * CAST(s1 AS DOUBLE)
                 / (CAST(n_customers AS DOUBLE) * CAST(s0 AS DOUBLE))
                 - (CAST(n_customers AS DOUBLE) + 1.0) / n_customers,
                 6) AS gini
    FROM a
    """,
    doc="Gini coefficient of revenue concentration across customers "
    "(the inequality diagnostic behind 'whale' analysis and data-source "
    "mix audits): facts collapse to per-customer exact-decimal totals "
    "in one keyed scan, the DIMENSION-sized totals relation gets "
    "DISTRIBUTED exact global row numbers over the deterministic "
    "(total, custkey) total order — two-phase range-partitioned rank "
    "(operators/stats.py:global_row_numbers), never a single-partition "
    "Window.orderBy — and G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n "
    "derives from exact decimal moments (rank*total products stay "
    "exact decimals; double only at the end). The rank touches "
    "customers, never line items (EXT stats/concentration)",
    tags=("orders", "agg", "stats"),
)
def agg_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import global_row_numbers

    orders = load_table(spark, sf_dir, "orders")
    totals = (
        orders.filter(
            F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total")
        )
    )
    ranked = global_row_numbers(totals, ["total", "o_custkey"]).select(
        "total", "i"
    )
    a = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("total").alias("s0"),
        F.sum(F.col("i") * F.col("total")).alias("s1"),
    )
    n_d = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0)
        * F.col("s1").cast("double")
        / (n_d * F.col("s0").cast("double"))
        - (n_d + 1.0) / n_d
    )
    return a.select(
        "n_customers",
        F.round(F.col("s0").cast("double"), 2).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    )


@register(
    "agg_benford_prices",
    oracle="""
    WITH v AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(l_extendedprice * 100.0, 0)
                     AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_p,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_p,
           ROUND(ABS(CAST(n AS DOUBLE) / total
                     - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
    FROM c CROSS JOIN t
    ORDER BY digit
    """,
    doc="Benford's-law first-significant-digit audit of line-item "
    "prices (the classic fabricated-data / fraud screen): per digit "
    "1-9, observed share vs the Benford expectation log10(1+1/d) and "
    "the absolute deviation. The first digit is extracted via exact "
    "integer arithmetic — round(price*100) to bigint, first character "
    "of its decimal rendering — NOT via floating log10, whose low-bit "
    "engine differences flip floor() at power-of-ten boundaries. One "
    "scan collapsing to <=9 cells; shares are ratios of exact integer "
    "counts (EXT stats/forensics)",
    tags=("lineitem", "agg", "stats"),
)
def agg_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).cast("int")
    from pyspark import StorageLevel

    # persisted: the total aggregate and the share join both consume
    # the <=9-cell digit grid; without this each re-scans lineitem
    c = (
        li.filter(
            F.col("l_extendedprice").isNotNull()
            & (F.col("l_extendedprice") > 0)
        )
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = c.agg(F.sum("n").cast("long").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(t)
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_p"),
            F.round(ben, 6).alias("benford_p"),
            F.round(F.abs(obs - ben), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "events_survival_km",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             CAST(MIN(ts) AS DATE) AS f,
             CAST(MAX(ts) AS DATE) AS l
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    g AS (SELECT MAX(l) AS gm FROM pu),
    lt AS (
      SELECT date_diff('day', f, l) AS t,
             CASE WHEN date_diff('day', l, gm) < 7 THEN 1 ELSE 0 END AS is_c
      FROM pu CROSS JOIN g
    ),
    grid AS (
      SELECT t, CAST(SUM(1 - is_c) AS BIGINT) AS d,
             CAST(SUM(is_c) AS BIGINT) AS c
      FROM lt GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n0 FROM grid),
    w AS (
      SELECT t, d, c,
             COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gone
      FROM grid
    ),
    f AS (
      SELECT w.t, w.d, w.c,
             CAST(tot.n0 - w.gone AS BIGINT) AS n_risk,
             1.0 - CAST(w.d AS DOUBLE) / (tot.n0 - w.gone) AS factor
      FROM w CROSS JOIN tot
    ),
    r AS (
      SELECT t, d, c, n_risk,
             list(factor) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
      FROM f
    )
    SELECT CAST(t AS INT) AS t, n_risk, d, c,
           ROUND(list_reduce([1.0] || fs, (a, x) -> a * x), 6) AS surv
    FROM r ORDER BY t
    """,
    doc="Kaplan-Meier survival curve of per-user activity lifetimes "
    "(days between first and last event), with users whose last event "
    "is within 7 days of the corpus end RIGHT-CENSORED — the "
    "censoring-aware upgrade of a plain retention ECDF, which is "
    "biased low near the observation edge. One keyed scan collapses "
    "events to per-user (first, last); the (lifetime -> deaths, "
    "censored) grid is bounded by the corpus time span in DAYS "
    "(time-proportional, never data-proportional); the product-limit "
    "fold S(t) = prod(1 - d/n_risk) runs left-to-right over the "
    "sorted grid, mirrored token-for-token by the oracle's window-"
    "list fold, so the double survival values hash identically "
    "(EXT stats/survival; operator operators/stats.py:"
    "kaplan_meier_lifetimes)",
    tags=("events", "agg", "stats"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import kaplan_meier_lifetimes

    ev = load_table(spark, sf_dir, "events")
    return kaplan_meier_lifetimes(ev, "user_id", "ts", censor_days=7)


@register(
    "events_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {_EV}
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sx2
      FROM daily GROUP BY event_type
    ),
    v AS (
      SELECT *,
             (sx2 - sx * sx / n_points) / NULLIF(n_points - 1.0, 0.0)
               AS var
      FROM a
    ),
    z AS (
      SELECT daily.event_type, daily.d,
             (CAST(daily.x AS DOUBLE) - v.sx / v.n_points) / sqrt(v.var)
               AS zv
      FROM daily JOIN v USING (event_type)
      WHERE v.var > 0
    ),
    s AS (
      SELECT event_type, d,
             list_reduce([0.0] || list(zv) OVER (
                 PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               (p, q) -> p + q) AS st
      FROM z
    ),
    b AS (
      SELECT event_type, d, ABS(st) AS astat,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(st) DESC, d) AS rn
      FROM s
    )
    SELECT v.event_type, v.n_points,
           CASE WHEN v.var > 0 THEN CAST(b.d AS TIMESTAMP) END AS cp_time,
           CASE WHEN v.var > 0
                THEN ROUND(b.astat / sqrt(CAST(v.n_points AS DOUBLE)), 6)
           END AS cusum_stat
    FROM v LEFT JOIN (SELECT * FROM b WHERE rn = 1) b USING (event_type)
    ORDER BY v.event_type
    """,
    doc="CUSUM changepoint scan of each event type's daily count "
    "series (the level-shift detector behind pipeline-health alerts): "
    "events collapse to the (type, day) count grid in one keyed scan "
    "— time-proportional, never data-proportional — then per group "
    "the standardized cumulative sum S_t folds left-to-right in "
    "pinned day order and the changepoint is the earliest day "
    "maximizing |S_t|, with statistic max|S|/sqrt(n) (compare ~1.36 "
    "for the 5% Kolmogorov bound). Moments are exact integers cast "
    "to double at the end; the oracle mirrors the fold association "
    "token-for-token via a window-list list_reduce (the survival_km "
    "technique), so the doubles hash identically; degenerate groups "
    "(n=1 or zero variance) yield NULLs via try_divide<->NULLIF "
    "(EXT stats/monitoring; operator operators/stats.py:"
    "cusum_changepoint)",
    tags=("events", "agg", "stats"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import cusum_changepoint

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    return cusum_changepoint(daily, "event_type", "d", "x").orderBy(
        "event_type"
    )
