"""Property tests for the round-7 statistics/eval/quality/spatial
operators (`operators/stats.py` additions, `operators/quality.py`,
`operators/geo.py`) against independent numpy/pandas recomputation.
The registry plans (`plans/stats_ml.py`) pin the same operators
against DuckDB oracles on the driver tables; these tests cover
arbitrary data shapes and the degenerate edges the fixed tables
cannot."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aics_dask_utils_spark.operators.geo import radius_self_join
from aics_dask_utils_spark.operators.quality import (
    check_suite,
    completeness,
    containment,
    uniqueness,
)
from aics_dask_utils_spark.operators.stats import (
    binary_classifier_eval,
    calibration_bins,
    chi2_independence,
    kruskal_wallis,
)
from pyspark.sql import functions as F

# 2-dp values spanning the KW grid including both absorbing edges.
_val2dp = st.integers(min_value=-10000, max_value=59999).map(lambda i: i / 100.0)


# ---------------------------------------------------------------- KW --


def _kw_numpy(groups, bin_width=5.0, n_bins=100):
    """Tie-corrected binned Kruskal-Wallis H, midranks from bin counts."""
    all_bins = [
        np.clip(np.floor(np.asarray(v) / bin_width).astype(int), 0, n_bins - 1)
        for v in groups
    ]
    t = np.zeros(n_bins)
    for b in all_bins:
        t += np.bincount(b, minlength=n_bins)
    n = t.sum()
    cum_before = np.concatenate([[0.0], np.cumsum(t)[:-1]])
    midrank = cum_before + (t + 1) / 2.0
    s = 0.0
    for b in all_bins:
        c = np.bincount(b, minlength=n_bins)
        r = float(np.sum(c * midrank))
        s += r * r / len(b)
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    corr = 1.0 - float(np.sum(t**3 - t)) / (n**3 - n) if n > 1 else 0.0
    return h, (h / corr if corr != 0 else None)


@given(
    a=st.lists(_val2dp, min_size=2, max_size=50),
    b=st.lists(_val2dp, min_size=2, max_size=50),
    c=st.lists(_val2dp, min_size=2, max_size=50),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kruskal_wallis_matches_numpy(spark, a, b, c):
    rows = (
        [("a", float(v)) for v in a]
        + [("b", float(v)) for v in b]
        + [("c", float(v)) for v in c]
    )
    df = spark.createDataFrame(rows, "grp string, value double")
    got = kruskal_wallis(df, "value", "grp").collect()[0]
    h, h_tc = _kw_numpy([a, b, c])
    assert got["n_groups"] == 3
    assert got["n_total"] == len(rows)
    assert got["dof"] == 2
    assert math.isclose(got["h_stat"], h, rel_tol=0, abs_tol=1e-5)
    if h_tc is None:
        assert got["h_tie_corrected"] is None
    else:
        assert math.isclose(got["h_tie_corrected"], h_tc, rel_tol=0, abs_tol=1e-5)


def test_kruskal_wallis_all_one_bin_yields_null_corrected(spark):
    # every value lands in bin 0 -> tie correction divides by zero -> NULL
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 0.5)],
        "grp string, value double",
    )
    got = kruskal_wallis(df, "value", "grp").collect()[0]
    assert got["h_tie_corrected"] is None
    assert got["h_stat"] == 0.0  # identical midranks in both groups


def test_kruskal_wallis_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), (None, 9.0), ("b", 40.0), ("b", 45.0)],
        "grp string, value double",
    )
    got = kruskal_wallis(df, "value", "grp").collect()[0]
    assert got["n_total"] == 3 and got["n_groups"] == 2


# -------------------------------------------------------------- chi2 --


def _chi2_numpy(rs, cs):
    tab = pd.crosstab(pd.Series(rs), pd.Series(cs)).to_numpy().astype(float)
    n = tab.sum()
    e = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = float(np.sum((tab - e) ** 2 / e))
    r, c = tab.shape
    v = (
        math.sqrt(chi2 / (n * min(r - 1, c - 1)))
        if min(r - 1, c - 1) > 0
        else None
    )
    return chi2, r, c, v


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]), st.integers(min_value=0, max_value=4)
        ),
        min_size=5,
        max_size=120,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chi2_matches_numpy(spark, rows):
    df = spark.createDataFrame(rows, "r string, c int")
    got = chi2_independence(df, "r", "c").collect()[0]
    chi2, r, c, v = _chi2_numpy([t[0] for t in rows], [t[1] for t in rows])
    assert got["n_total"] == len(rows)
    assert got["n_rows"] == r and got["n_cols"] == c
    assert got["dof"] == (r - 1) * (c - 1)
    assert math.isclose(got["chi2"], chi2, rel_tol=0, abs_tol=1e-5)
    if v is None:
        assert got["cramers_v"] is None
    else:
        assert math.isclose(got["cramers_v"], v, rel_tol=0, abs_tol=1e-5)


def test_chi2_single_row_category_yields_null_v(spark):
    df = spark.createDataFrame(
        [("only", 1), ("only", 2), ("only", 1)], "r string, c int"
    )
    got = chi2_independence(df, "r", "c").collect()[0]
    assert got["n_rows"] == 1 and got["dof"] == 0
    assert got["chi2"] == 0.0
    assert got["cramers_v"] is None


# ---------------------------------------------------- classifier eval --


def _eval_numpy(scores, labels, n_bins=1000, eps=1e-15):
    s = np.clip(np.asarray(scores, dtype=float), 0.0, 1.0)
    y = np.asarray(labels, dtype=int)
    bins = np.clip(np.floor(s * n_bins).astype(int), 0, n_bins - 1)
    pos = np.bincount(bins, weights=y, minlength=n_bins)
    neg = np.bincount(bins, weights=1 - y, minlength=n_bins)
    cum_neg_before = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
    u = float(np.sum(pos * (cum_neg_before + neg / 2.0)))
    n_pos, n_neg = int(y.sum()), int(len(y) - y.sum())
    auc = u / (n_pos * n_neg) if n_pos and n_neg else None
    brier = float(np.mean((s - y) ** 2))
    sc = np.clip(s, eps, 1 - eps)
    ll = float(np.mean(-(y * np.log(sc) + (1 - y) * np.log(1 - sc))))
    return n_pos, n_neg, auc, brier, ll


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000).map(lambda i: i / 1000.0),
            st.booleans(),
        ),
        min_size=4,
        max_size=150,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_classifier_eval_matches_numpy(spark, rows):
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = binary_classifier_eval(df, "score", "label").collect()[0]
    n_pos, n_neg, auc, brier, ll = _eval_numpy(
        [r[0] for r in rows], [int(r[1]) for r in rows]
    )
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    if auc is None:
        assert got["auc"] is None
    else:
        assert math.isclose(got["auc"], auc, rel_tol=0, abs_tol=1e-5)
    assert math.isclose(got["brier"], brier, rel_tol=0, abs_tol=1e-5)
    assert math.isclose(got["logloss"], ll, rel_tol=0, abs_tol=1e-5)


def test_classifier_eval_perfect_separation_auc_one(spark):
    rows = [(0.9, True)] * 5 + [(0.1, False)] * 5
    got = binary_classifier_eval(
        spark.createDataFrame(rows, "score double, label boolean"),
        "score",
        "label",
    ).collect()[0]
    assert got["auc"] == 1.0


def test_classifier_eval_single_class_null_auc(spark):
    rows = [(0.4, True), (0.7, True)]
    got = binary_classifier_eval(
        spark.createDataFrame(rows, "score double, label boolean"),
        "score",
        "label",
    ).collect()[0]
    assert got["auc"] is None and got["n_neg"] == 0


def test_calibration_bins_matches_pandas(spark):
    rows = [(i / 20.0, i % 3 == 0) for i in range(21)]
    got = (
        calibration_bins(
            spark.createDataFrame(rows, "score double, label boolean"),
            "score",
            "label",
        )
        .toPandas()
        .set_index("bin")
    )
    pdf = pd.DataFrame(rows, columns=["s", "y"])
    pdf["bin"] = np.clip(np.floor(pdf.s * 10).astype(int), 0, 9)
    exp = pdf.groupby("bin").agg(n=("s", "size"), ms=("s", "mean"), fp=("y", "mean"))
    assert list(got.index) == list(exp.index)
    assert (got.n == exp.n).all()
    assert np.allclose(got.mean_score, exp.ms.round(6), atol=1e-9)
    assert np.allclose(got.frac_pos, exp.fp.round(6), atol=1e-9)


# ----------------------------------------------------------- quality --


def test_check_suite_matches_manual_metrics(spark):
    df = spark.createDataFrame(
        [("a", "en", 10), ("b", "en", 20), ("c", None, 30), ("c", "xx", None)],
        "id string, lang string, n int",
    )
    out = {
        r["check"]: r
        for r in check_suite(
            df,
            [
                ("c_lang", completeness("lang"), 0.5, 1.0),
                ("u_id", uniqueness("id"), 1.0, 1.0),
                ("in_lang", containment("lang", ["en"]), 0.9, 1.0),
                ("max_n", F.max("n"), 0.0, 25.0),
            ],
        ).collect()
    }
    assert out["c_lang"]["metric"] == 0.75 and out["c_lang"]["passed"]
    assert out["u_id"]["metric"] == 0.75 and not out["u_id"]["passed"]
    assert out["in_lang"]["metric"] == 0.5 and not out["in_lang"]["passed"]
    assert out["max_n"]["metric"] == 30.0 and not out["max_n"]["passed"]


def test_check_suite_null_metric_fails_closed(spark):
    empty = spark.createDataFrame([], "n int")
    rows = check_suite(empty, [("min_n", F.min("n"), 0.0, 1.0)]).collect()
    assert rows[0]["metric"] is None and rows[0]["passed"] is False


def test_check_suite_rejects_empty_checks(spark):
    with pytest.raises(ValueError):
        check_suite(spark.range(1), [])


# --------------------------------------------------------------- geo --


def _haversine_np(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = np.radians(lat2 - lat1)
    dlmb = np.radians(lon2 - lon1)
    a = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2) ** 2
    return 2 * r * np.arcsin(np.minimum(np.sqrt(a), 1.0))


def test_radius_join_matches_brute_force(spark):
    rng = np.random.RandomState(7)
    n = 120
    lat = rng.uniform(-60, 60, n)
    # stay away from the antimeridian (documented non-wrap contract)
    lon = rng.uniform(-150, 150, n)
    pts = spark.createDataFrame(
        [(i, float(lat[i]), float(lon[i])) for i in range(n)],
        "pid int, lat double, lon double",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist_km"]
        for r in radius_self_join(pts, "pid", "lat", "lon", 500.0).collect()
    }
    exp = {}
    for i in range(n):
        d = _haversine_np(lat[i], lon[i], lat, lon)
        for j in range(i + 1, n):
            if d[j] <= 500.0:
                exp[(i, j)] = d[j]
    assert set(got) == set(exp)  # exactly once, no misses, no dups
    for k, v in exp.items():
        assert math.isclose(got[k], v, rel_tol=0, abs_tol=1e-5)


def test_radius_join_excludes_nulls_and_validates_lat_bound(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, 1.0), (3, 0.1, 0.1)],
        "pid int, lat double, lon double",
    )
    rows = radius_self_join(pts, "pid", "lat", "lon", 100.0).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 3)]
    with pytest.raises(ValueError):
        radius_self_join(pts, "pid", "lat", "lon", 100.0, max_abs_lat=90.0)


# --------------------------------------------------- global rank --


def test_global_row_numbers_matches_sorted_enumerate(spark):
    from aics_dask_utils_spark.operators.stats import global_row_numbers

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 50, 300)  # heavy ties -> tiebreak via id
    df = spark.createDataFrame(
        [(int(i), int(vals[i])) for i in range(300)], "id int, v int"
    )
    got = global_row_numbers(df, ["v", "id"], num_partitions=7).collect()
    expect = {
        (v, i): rank + 1
        for rank, (v, i) in enumerate(sorted(zip(vals.tolist(), range(300))))
    }
    assert len(got) == 300
    for r in got:
        assert r["i"] == expect[(r["v"], r["id"])]
    assert sorted(r["i"] for r in got) == list(range(1, 301))


def test_global_row_numbers_partition_count_invariant(spark):
    from aics_dask_utils_spark.operators.stats import global_row_numbers

    df = spark.createDataFrame([(i, i % 9) for i in range(64)], "id int, v int")
    a = {
        (r["id"]): r["i"]
        for r in global_row_numbers(df, ["v", "id"], num_partitions=2).collect()
    }
    b = {
        (r["id"]): r["i"]
        for r in global_row_numbers(df, ["v", "id"], num_partitions=13).collect()
    }
    assert a == b


def test_global_row_numbers_desc_order_columns(spark):
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import global_row_numbers

    df = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(100)], "id int, v int"
    )
    got = {
        r["id"]: r["i"]
        for r in global_row_numbers(
            df, [F.desc("v"), F.asc("id")], num_partitions=5
        ).collect()
    }
    order = sorted(range(100), key=lambda i: (-((i * 7) % 23), i))
    expect = {i: rank + 1 for rank, i in enumerate(order)}
    assert got == expect


def test_global_running_sums_matches_single_task_window(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import global_running_sums

    rng = np.random.RandomState(3)
    rows = [(int(i), int(rng.randint(0, 40)), int(rng.randint(1, 500)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id int, v int, tok long")
    got = {
        r["id"]: (r["i"], r["cum"])
        for r in global_running_sums(
            df,
            [F.desc("v"), F.asc("id")],
            {"cum": "tok"},
            num_partitions=7,
            row_col="i",
        ).collect()
    }
    w = W.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ref = {
        r["id"]: (r["i"], r["cum"])
        for r in df.select(
            "id",
            F.row_number()
            .over(W.orderBy(F.desc("v"), F.asc("id")))
            .cast("long")
            .alias("i"),
            F.sum("tok").over(w).alias("cum"),
        ).collect()
    }
    assert got == ref


def test_global_running_sums_null_values_match_single_task_window(spark):
    """Regression for the r8 ADVICE finding: a summed column that is
    NULL for every row of a range partition's local prefix must still
    pick up earlier partitions' cumulative total (offset + NULL was
    yielding NULL), and rows whose ENTIRE global prefix is NULL must
    stay NULL — exactly the single-task SUM-skips-NULLs semantics."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import global_running_sums

    # v ascending order; tok NULL on a long leading stretch (covers the
    # all-NULL-global-prefix rows) and on full mid-stream stretches
    # longer than a range partition (covers the all-NULL-local-prefix
    # divergence), with many partitions so stretches straddle them.
    rows = []
    for i in range(300):
        tok = None if (i < 40 or 100 <= i < 180 or i % 7 == 0) else int(i)
        rows.append((int(i), tok))
    df = spark.createDataFrame(rows, "id int, tok long")
    got = {
        r["id"]: r["cum"]
        for r in global_running_sums(
            df, ["id"], {"cum": "tok"}, num_partitions=11
        ).collect()
    }
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    ref = {
        r["id"]: r["cum"]
        for r in df.select("id", F.sum("tok").over(w).alias("cum")).collect()
    }
    assert got == ref
    assert ref[0] is None and ref[39] is None  # all-NULL prefix stays NULL
    assert ref[150] is not None  # mid-stream NULL stretch keeps the offset


def test_ntile_from_rank_matches_spark_ntile_exhaustively(spark):
    """Differential vs F.ntile over every (n, k) in a dense grid —
    the exact-integer formula must agree bit-for-bit, including the
    n < k degenerate cases."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import ntile_from_rank

    rows = [
        (n, k, i)
        for n in range(1, 26)
        for k in (1, 2, 3, 4, 5, 7, 8)
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n long, k long, i long")
    mismatches = []
    for k in (1, 2, 3, 4, 5, 7, 8):
        sub = df.where(F.col("k") == k)
        ref = sub.withColumn(
            "want", F.ntile(k).over(W.partitionBy("n").orderBy("i"))
        )
        got = ref.withColumn(
            "got", ntile_from_rank(F.col("i"), F.col("n"), k)
        )
        bad = got.where(F.col("want") != F.col("got")).collect()
        mismatches.extend((k, r["n"], r["i"], r["want"], r["got"]) for r in bad)
    assert not mismatches, mismatches[:20]


# ------------------------------------------------------ Kaplan-Meier --


def test_kaplan_meier_matches_numpy(spark):
    from datetime import datetime, timedelta

    from aics_dask_utils_spark.operators.stats import kaplan_meier_lifetimes

    base = datetime(2024, 1, 1)
    rng = np.random.RandomState(3)
    rows = []
    spans = {}
    for u in range(40):
        first = base + timedelta(days=int(rng.randint(0, 10)))
        life = int(rng.randint(0, 15))
        last = first + timedelta(days=life)
        spans[u] = (first, last)
        rows += [(u, first), (u, last)]
        # noise events inside the span must not move first/last
        if life > 1:
            rows.append((u, first + timedelta(days=1)))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        r["t"]: r
        for r in kaplan_meier_lifetimes(df, "user_id", "ts", censor_days=7)
        .collect()
    }
    gmax = max(l for _, l in spans.values())
    lifetimes = {
        u: ((l - f).days, (gmax - l).days < 7) for u, (f, l) in spans.items()
    }
    ts = sorted({t for t, _ in lifetimes.values()})
    n_alive = len(lifetimes)
    s = 1.0
    for t in ts:
        d = sum(1 for lt, c in lifetimes.values() if lt == t and not c)
        c = sum(1 for lt, cc in lifetimes.values() if lt == t and cc)
        r = got[t]
        assert r["n_risk"] == n_alive and r["d"] == d and r["c"] == c
        s *= 1.0 - d / n_alive
        assert math.isclose(r["surv"], s, rel_tol=0, abs_tol=1e-6)
        n_alive -= d + c
    assert set(got) == set(ts)
    # survival is non-increasing
    survs = [got[t]["surv"] for t in ts]
    assert all(a >= b - 1e-12 for a, b in zip(survs, survs[1:]))


# ------------------------------------------------------------ CUSUM --


def _cusum_numpy(xs):
    x = np.asarray(xs, dtype=float)
    n = len(x)
    if n < 2 or x.std(ddof=1) == 0:
        return None, None
    z = (x - x.mean()) / x.std(ddof=1)
    s = np.cumsum(z)
    i = int(np.argmax(np.abs(s)))  # earliest on ties (argmax contract)
    return i, float(np.abs(s).max() / np.sqrt(n))


def test_cusum_matches_numpy(spark):
    from datetime import datetime, timedelta

    from aics_dask_utils_spark.operators.stats import cusum_changepoint

    base = datetime(2024, 1, 1)
    rng = np.random.RandomState(5)
    series = {
        "stable": rng.normal(10, 1, 30).round(2),
        # level shift at index 15 -> CUSUM should peak near there
        "shifted": np.concatenate(
            [rng.normal(10, 1, 15), rng.normal(20, 1, 15)]
        ).round(2),
    }
    rows = [
        (g, base + timedelta(days=i), float(v))
        for g, xs in series.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, t timestamp, v double")
    got = {r["g"]: r for r in cusum_changepoint(df, "g", "t", "v").collect()}
    for g, xs in series.items():
        i, stat = _cusum_numpy(xs)
        r = got[g]
        assert r["n_points"] == len(xs)
        assert r["cp_time"] == base + timedelta(days=i)
        assert math.isclose(r["cusum_stat"], stat, rel_tol=0, abs_tol=1e-6)
    # the shifted series must peak at the boundary and exceed the
    # 5% Kolmogorov bound; the stable one must not
    assert got["shifted"]["cp_time"] == base + timedelta(days=14)
    assert got["shifted"]["cusum_stat"] > 1.36 > got["stable"]["cusum_stat"]


def test_cusum_degenerate_yields_null(spark):
    from datetime import datetime

    from aics_dask_utils_spark.operators.stats import cusum_changepoint

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 5.0), ("a", datetime(2024, 1, 2), 5.0),
         ("b", datetime(2024, 1, 1), 3.0)],
        "g string, t timestamp, v double",
    )
    got = {r["g"]: r for r in cusum_changepoint(df, "g", "t", "v").collect()}
    assert got["a"]["cusum_stat"] is None  # zero variance
    assert got["b"]["cusum_stat"] is None  # single point


def test_grouped_row_numbers_matches_partitioned_window(spark):
    # Differential: the distributed per-group rank must equal the
    # single-task-per-group row_number().over(partitionBy(g).orderBy(o))
    # it replaces, on a skewed layout (one big group, one singleton).
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import grouped_row_numbers

    rng = random.Random(7)
    rows = [(i % 3 if i < 59 else 99, rng.randint(0, 9), i) for i in range(60)]
    df = spark.createDataFrame(rows, "g int, v int, id long")
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r["g"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {
        (r["g"], r["id"]): r["i"]
        for r in grouped_row_numbers(
            df, ["g"], [F.desc("v"), F.asc("id")], num_partitions=7
        ).collect()
    }
    assert got == want


def test_grouped_row_numbers_partition_count_invariant(spark):
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import grouped_row_numbers

    df = spark.createDataFrame(
        [(i % 4, (i * 13) % 11, i) for i in range(50)], "g int, v int, id long"
    )
    a = {
        (r["g"], r["id"]): r["i"]
        for r in grouped_row_numbers(
            df, ["g"], ["v", "id"], num_partitions=2
        ).collect()
    }
    b = {
        (r["g"], r["id"]): r["i"]
        for r in grouped_row_numbers(
            df, ["g"], ["v", "id"], num_partitions=13
        ).collect()
    }
    assert a == b


def test_grouped_row_numbers_spanning_blocks_match_window(spark):
    # Round-13 one-pass internals: the per-(partition, group) block
    # arithmetic must reproduce the partitioned window exactly when
    # groups SPAN range partitions (num_partitions >> groups forces
    # every group across several partition boundaries) and when many
    # groups share one partition (num_partitions=1).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.operators.stats import grouped_row_numbers

    df = spark.createDataFrame(
        [(i % 3, (i * 7) % 13, i) for i in range(60)], "g int, v int, id long"
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r["g"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    for n_parts in (1, 17):
        got = {
            (r["g"], r["id"]): r["i"]
            for r in grouped_row_numbers(
                df, ["g"], [F.desc("v"), F.asc("id")], num_partitions=n_parts
            ).collect()
        }
        assert got == want, n_parts
