"""Distributed statistics: drift monitoring, A/B testing, per-key caps.

The "model-fit and monitoring" layer of a corpus pipeline, built on one
scale shape: a single keyed scan with map-side partials collapses the
data to a grid that is tiny by construction (histogram cells, moments,
per-key counts), and the statistic derives in closed form from the
grid. Nothing here sorts or ranks raw rows globally, and every double
result is partition-count- and engine-deterministic:

- integer quantities (counts, cumulative counts) stay exact integers;
- float sums accumulate as exact decimals (`functions/deterministic`);
- unavoidable double folds (PSI terms) run in a PINNED order over the
  collected grid, never in partition order.

The reference has no statistics surface; these are EXT capabilities of
the LLM-data-pipeline north star (SURVEY §2b). Registry plans
(`plans/events_windows.py`, `plans/llm_pipeline.py`) delegate here and
pin each result against a DuckDB oracle; `tests/test_stats_operators.py`
property-tests the operators on random frames against numpy.

`mann_whitney_u` is library-only this round: the round-5 driver window
is fully allocated and a plan must be attested the round it registers,
so its registry plan (+ DuckDB oracle, both straightforward — the same
grid CTE as `events_value_drift`) takes a round-6 window slot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_ecdf_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    *,
    bin_width: float = 5.0,
    n_bins: int = 100,
) -> DataFrame:
    """Two-sample distribution drift on a pinned histogram grid.

    Returns a 1-row frame ``(n_a, n_b, ks_d, psi)``: the binned-ECDF
    Kolmogorov-Smirnov sup-distance (9 dp) and the Population
    Stability Index (6 dp, Laplace-smoothed 0.5/cell) between the
    ``value_col`` distributions of groups ``label_a`` and ``label_b``.

    Exact KS needs a global rank of every observation — unaffordable
    at scale. The binned statistic is ONE map-side-combined groupBy
    onto ``n_bins`` cells (``floor(value / bin_width)``, both edge
    cells absorbing out-of-range values); cumulative counts stay exact
    integers so the KS term set is engine-identical, and the PSI
    doubles fold in pinned bin order over the collected grid. Rows
    whose ``group_col`` is neither label (including NULL) are ignored,
    and so are NULL ``value_col`` rows — a NULL value has no bin, and
    letting it form a NULL bin group would both skew n_a/n_b and sort
    engine-dependently (Spark array_sort vs SQL window ORDER BY place
    NULL differently). If either sample is empty, ks_d degrades to 0.0
    rather than erroring — check ``n_a``/``n_b`` before trusting the
    statistics.
    """
    smooth_den = 0.5 * n_bins
    pair = df.filter(
        F.col(group_col).isin(label_a, label_b)
        & F.col(value_col).isNotNull()
    )
    # Both grid edges absorb: values below 0 clamp into bin 0 the same
    # way the tail clamps into the last bin, so the cell count is
    # bounded by n_bins for ANY input domain.
    bin_ = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    is_a = F.col(group_col) == label_a
    cells = pair.groupBy(bin_.alias("bin")).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("cb"),
    )
    one = cells.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.array_sort(F.collect_list(F.struct("bin", "ca", "cb"))).alias("grid"),
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    ks_init = F.struct(
        F.lit(0).cast("long").alias("cum_a"),
        F.lit(0).cast("long").alias("cum_b"),
        F.lit(0.0).alias("d"),
    )
    # try_divide: ANSI mode throws DIVIDE_BY_ZERO for every numeric
    # type including double, so an empty sample (n == 0) must divide
    # to NULL, which greatest() then skips — ks_d degrades to 0.0
    # instead of crashing. Callers should check n_a/n_b > 0.
    ks = F.aggregate(
        "grid",
        ks_init,
        lambda acc, x: F.struct(
            (acc["cum_a"] + x["ca"]).alias("cum_a"),
            (acc["cum_b"] + x["cb"]).alias("cum_b"),
            F.greatest(
                acc["d"],
                F.abs(
                    F.try_divide((acc["cum_a"] + x["ca"]).cast("double"), na_d)
                    - F.try_divide((acc["cum_b"] + x["cb"]).cast("double"), nb_d)
                ),
            ).alias("d"),
        ),
    )["d"]

    def _p(x, cnt, n_d):
        # Smoothed cell proportion; term order mirrors the SQL oracle.
        return (x[cnt].cast("double") + F.lit(0.5)) / (
            n_d + F.lit(smooth_den)
        )

    psi = F.aggregate(
        "grid",
        F.lit(0.0),
        lambda a, x: a
        + (_p(x, "ca", na_d) - _p(x, "cb", nb_d))
        * F.log(_p(x, "ca", na_d) / _p(x, "cb", nb_d)),
    )
    return one.select(
        "n_a",
        "n_b",
        F.round(ks, 9).alias("ks_d"),
        F.round(psi, 6).alias("psi"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    variant_col: str,
    baseline: str,
    *,
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Per-variant Welch's t-test against a baseline variant.

    Returns one row per non-baseline variant:
    ``(<variant_col>, n_a, n_b, mean_diff, t_stat, df)`` with the
    Welch-Satterthwaite degrees of freedom, all rounded to 6 dp.

    Moments only: count, sum and sum-of-squares accumulate as EXACT
    decimals (``value_decimal`` must hold the input exactly — default
    suits 2-dp metrics), so one keyed scan with map-side partials
    collapses the data to a per-variant moment grid; the baseline row
    joins back as a broadcast and t/df derive in closed-form double.
    At 100 TB this scores thousands of experiment cells in one pass.
    Degenerate groups yield NULL, never an error: ANSI mode throws
    DIVIDE_BY_ZERO for every numeric type (including double), so the
    zero-able denominators — (n-1) for singleton groups, the standard
    error for zero-variance pairs — go through ``try_divide``, whose
    NULL propagates to t/df. Rows whose ``variant_col`` is NULL match
    neither the baseline filter nor its negation and are excluded, and
    NULL ``value_col`` rows are filtered out up front — counting them
    in n while SUM skips them would silently bias every mean and
    variance (oracles must mirror with WHERE value IS NOT NULL).
    """
    v = F.col(value_col).cast(value_decimal)
    g = df.filter(F.col(value_col).isNotNull()).groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("sv"),
        F.sum(v * v).cast("double").alias("sv2"),
    )
    base = g.filter(F.col(variant_col) == baseline).select(
        F.col("n").alias("n_b"),
        F.col("sv").alias("svb"),
        F.col("sv2").alias("sv2b"),
    )
    arms = g.filter(F.col(variant_col) != baseline).select(
        variant_col,
        F.col("n").alias("n_a"),
        F.col("sv").alias("sva"),
        F.col("sv2").alias("sv2a"),
    )
    j = arms.crossJoin(F.broadcast(base))
    # Group counts are >= 1 by construction, so /n is safe; every
    # zero-able denominator goes through try_divide (see docstring).
    mean_diff = F.col("sva") / F.col("n_a") - F.col("svb") / F.col("n_b")
    se2a = (
        F.try_divide(
            F.col("sv2a") - F.col("sva") * F.col("sva") / F.col("n_a"),
            F.col("n_a") - 1,
        )
    ) / F.col("n_a")
    se2b = (
        F.try_divide(
            F.col("sv2b") - F.col("svb") * F.col("svb") / F.col("n_b"),
            F.col("n_b") - 1,
        )
    ) / F.col("n_b")
    dof = F.try_divide(
        F.pow(se2a + se2b, 2),
        F.try_divide(F.pow(se2a, 2), F.col("n_a") - 1)
        + F.try_divide(F.pow(se2b, 2), F.col("n_b") - 1),
    )
    return j.select(
        variant_col,
        "n_a",
        "n_b",
        F.round(mean_diff, 6).alias("mean_diff"),
        F.round(F.try_divide(mean_diff, F.sqrt(se2a + se2b)), 6).alias(
            "t_stat"
        ),
        F.round(dof, 6).alias("df"),
    ).orderBy(variant_col)


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per key, preferring ``order_cols`` order.

    The RefinedWeb/C4 host-cap shape, skew-aware: a tiny per-key count
    relation (map-side combined) broadcast-splits the scan — keys
    already at or under the cap keep every row WITHOUT sorting (at web
    scale, almost all of them), and only oversized keys pay the
    ``row_number`` window, which Spark further prunes with a
    below-shuffle WindowGroupLimit so at most ~k rows per key reach
    the window sort. ``order_cols`` must be a total order within every
    key (include a unique tiebreak) or the kept set is nondeterministic.
    NULL key values form their own group and are capped like any other
    (the split joins are null-safe), matching groupBy semantics.
    """
    import operator
    from functools import reduce

    from pyspark.sql.window import Window as W

    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))

    def _semi(pred):
        # Null-safe semi join against the (aliased) key list so
        # NULL-keyed rows route to their branch instead of vanishing.
        side = counts.filter(pred).select(
            *[F.col(c).alias(f"__ck_{c}") for c in keys]
        )
        cond = reduce(
            operator.and_,
            [df[c].eqNullSafe(side[f"__ck_{c}"]) for c in keys],
        )
        return df.join(F.broadcast(side), cond, "left_semi")

    keep_all = _semi(F.col("cnt") <= k)
    capped = (
        _semi(F.col("cnt") > k)
        .withColumn(
            "__rk",
            F.row_number().over(
                W.partitionBy(*keys).orderBy(*order_cols)
            ),
        )
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    return keep_all.unionByName(capped)


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    *,
    bin_width: float = 5.0,
    n_bins: int = 100,
) -> DataFrame:
    """Binned two-sample Mann-Whitney U with a tie-corrected normal z.

    Returns a 1-row frame ``(n_a, n_b, u_stat, z_score)``. The
    nonparametric complement of :func:`welch_ttest`: no normality
    assumption, robust to heavy tails — the right default for skewed
    production metrics (latencies, revenues).

    Exact U needs a global rank of every observation; like
    :func:`binned_ecdf_drift` this uses the pinned histogram grid
    instead, treating each cell as one midrank tie group (the standard
    tie treatment, so U = sum_i ca_i * (cumB_{<i} + cb_i/2)) — ONE
    map-side-combined groupBy, then pinned-order folds over the
    <= n_bins collected cells. The tie-corrected variance
    n_a*n_b/12 * ((n+1) - sum(t^3 - t)/(n*(n-1))) uses the cell totals
    as tie-group sizes. Accumulation is double (a test statistic, not
    an accounting sum) but partition- and engine-deterministic because
    every fold runs in bin order over exact integer cell counts.
    Degenerate inputs (a sample empty, all values in one cell) yield
    NULL z via ``try_divide``, never an error. No continuity
    correction is applied. NULL ``value_col`` rows are excluded (no
    bin, and a NULL bin group would skew n and sort engine-dependently)
    as are rows whose ``group_col`` is neither label.
    """
    pair = df.filter(
        F.col(group_col).isin(label_a, label_b)
        & F.col(value_col).isNotNull()
    )
    bin_ = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    is_a = F.col(group_col) == label_a
    cells = pair.groupBy(bin_.alias("bin")).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("cb"),
    )
    one = cells.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.array_sort(F.collect_list(F.struct("bin", "ca", "cb"))).alias("grid"),
    )
    u_init = F.struct(
        F.lit(0).cast("long").alias("cum_b"),
        F.lit(0.0).alias("u"),
    )
    u = F.aggregate(
        "grid",
        u_init,
        lambda acc, x: F.struct(
            (acc["cum_b"] + x["cb"]).alias("cum_b"),
            (
                acc["u"]
                + x["ca"].cast("double")
                * (acc["cum_b"].cast("double") + x["cb"].cast("double") / 2.0)
            ).alias("u"),
        ),
    )["u"]
    tie_sum = F.aggregate(
        "grid",
        F.lit(0.0),
        lambda a, x: a
        + (
            F.pow((x["ca"] + x["cb"]).cast("double"), 3)
            - (x["ca"] + x["cb"]).cast("double")
        ),
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    n_d = na_d + nb_d
    var = (na_d * nb_d / 12.0) * (
        (n_d + 1.0) - F.try_divide(tie_sum, n_d * (n_d - 1.0))
    )
    z = F.try_divide(u - na_d * nb_d / 2.0, F.sqrt(var))
    return one.select(
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )
