"""Directed tests for the late-round-5 plans: per-source caps, the
binned-ECDF drift statistics, and the Welch A/B t-test.

The registry oracle test already cross-checks each plan against DuckDB;
these tests add an INDEPENDENT numpy recomputation of the statistics
straight from the parquet (no SQL engine at all) plus the semantic
invariants the SQL comparison cannot express (cap actually binds,
KS/PSI bounds, Welch symmetry against scipy-free closed forms).
"""

import math

import numpy as np
import pandas as pd
import pytest

from aics_dask_utils_spark.plans import all_plans


def _run(spark, sf_dir, name):
    return all_plans()[name].fn(spark, sf_dir).toPandas()


def test_source_caps_bind_and_prefer_long_docs(spark, sf_dir):
    out = _run(spark, sf_dir, "pipeline_source_caps")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "source", "n_chars"]
    ]
    per_source = out.groupby("source").size()
    assert (per_source <= 10).all(), "cap must bind at 10 docs per source"
    # Every source present in the corpus must survive (caps drop rows,
    # never whole domains).
    assert set(out["source"]) == set(docs["source"])
    # Within each source the kept set is exactly the top-10 by
    # (n_chars DESC, doc_id ASC).
    expect = (
        docs.sort_values(["source", "n_chars", "doc_id"], ascending=[True, False, True])
        .groupby("source")
        .head(10)
    )
    got = set(map(tuple, out[["doc_id", "source"]].itertuples(index=False)))
    want = set(map(tuple, expect[["doc_id", "source"]].itertuples(index=False)))
    assert got == want


def test_value_drift_matches_numpy_recompute(spark, sf_dir):
    out = _run(spark, sf_dir, "events_value_drift")
    assert len(out) == 1
    row = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    # Mirror the operator's full contract, not just what sf0.001 data
    # happens to exercise: NULL values are excluded and BOTH grid edges
    # clamp (negative values into bin 0, the tail into bin 99).
    a = ev.loc[ev.event_type == "click", "value"].dropna().to_numpy()
    b = ev.loc[ev.event_type == "purchase", "value"].dropna().to_numpy()
    bins = np.clip(np.floor(np.concatenate([a, b]) / 5.0), 0, 99).astype(int)
    ba, bb = bins[: len(a)], bins[len(a) :]
    ca = np.bincount(ba, minlength=100).astype(float)
    cb = np.bincount(bb, minlength=100).astype(float)
    ks = np.max(np.abs(np.cumsum(ca) / len(a) - np.cumsum(cb) / len(b)))
    present = (ca + cb) > 0  # the plan only folds bins present in the data
    pa = (ca[present] + 0.5) / (len(a) + 50.0)
    pb = (cb[present] + 0.5) / (len(b) + 50.0)
    psi = float(np.sum((pa - pb) * np.log(pa / pb)))
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["ks_d"] == pytest.approx(ks, abs=1e-9)
    assert row["psi"] == pytest.approx(psi, abs=1e-6)
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["psi"] >= 0.0  # each (pa-pb)·ln(pa/pb) term is non-negative


def test_welch_ttest_matches_numpy_recompute(spark, sf_dir):
    out = _run(spark, sf_dir, "events_welch_ttest").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    base = ev.loc[ev.event_type == "view", "value"].to_numpy()
    nb, mb, vb = len(base), base.mean(), base.var(ddof=1)
    assert set(out.index) == set(ev.event_type.unique()) - {"view"}
    for etype, r in out.iterrows():
        arm = ev.loc[ev.event_type == etype, "value"].to_numpy()
        na, ma, va = len(arm), arm.mean(), arm.var(ddof=1)
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        assert r["n_a"] == na and r["n_b"] == nb
        assert r["mean_diff"] == pytest.approx(ma - mb, abs=1e-6)
        assert r["t_stat"] == pytest.approx(t, abs=1e-5)
        assert r["df"] == pytest.approx(df, rel=1e-6)
        # Welch df is bounded by min(na, nb) - 1 below and na + nb - 2 above.
        assert min(na, nb) - 1 <= r["df"] <= na + nb - 2


def _edge_fixture(spark):
    """Injected sample with everything sf0.001 events lack: negative
    values (left-edge clamp), values beyond the grid (right-edge
    clamp), NULL values (must be excluded), and rows of a third /
    NULL group (must be ignored)."""
    rows = (
        [("a", float(v)) for v in (-12.0, -0.1, 0.0, 4.9, 37.0, 600.0)]
        + [("b", float(v)) for v in (-3.0, 2.0, 2.0, 88.0, 499.9, 1e12)]
        + [("a", None), ("b", None), ("other", 5.0), (None, 7.0)]
    )
    return spark.createDataFrame(rows, "grp string, value double")


def _edge_bins(vals):
    v = np.array([x for x in vals if x is not None], dtype=float)
    return np.clip(np.floor(v / 5.0), 0, 99).astype(int)


def test_drift_operator_clamps_edges_and_drops_nulls(spark):
    from aics_dask_utils_spark.operators.stats import binned_ecdf_drift

    df = _edge_fixture(spark)
    row = binned_ecdf_drift(df, "value", "grp", "a", "b").toPandas().iloc[0]
    a = [-12.0, -0.1, 0.0, 4.9, 37.0, 600.0]
    b = [-3.0, 2.0, 2.0, 88.0, 499.9, 1e12]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)  # NULLs excluded
    ba, bb = _edge_bins(a), _edge_bins(b)
    assert ba.min() == 0 and ba.max() == 99  # both clamps exercised
    ca = np.bincount(ba, minlength=100).astype(float)
    cb = np.bincount(bb, minlength=100).astype(float)
    ks = np.max(np.abs(np.cumsum(ca) / len(a) - np.cumsum(cb) / len(b)))
    present = (ca + cb) > 0
    pa = (ca[present] + 0.5) / (len(a) + 50.0)
    pb = (cb[present] + 0.5) / (len(b) + 50.0)
    psi = float(np.sum((pa - pb) * np.log(pa / pb)))
    assert row["ks_d"] == pytest.approx(ks, abs=1e-9)
    assert row["psi"] == pytest.approx(psi, abs=1e-6)


def test_mann_whitney_clamps_edges_and_drops_nulls(spark):
    from aics_dask_utils_spark.operators.stats import mann_whitney_u

    df = _edge_fixture(spark)
    row = mann_whitney_u(df, "value", "grp", "a", "b").toPandas().iloc[0]
    a = [-12.0, -0.1, 0.0, 4.9, 37.0, 600.0]
    b = [-3.0, 2.0, 2.0, 88.0, 499.9, 1e12]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    ba, bb = _edge_bins(a), _edge_bins(b)
    # Midrank-tie U over the binned cells: U = sum_i ca_i*(cumB<i + cb_i/2)
    ca = np.bincount(ba, minlength=100).astype(float)
    cb = np.bincount(bb, minlength=100).astype(float)
    cum_b = np.concatenate([[0.0], np.cumsum(cb)[:-1]])
    u = float(np.sum(ca * (cum_b + cb / 2.0)))
    assert row["u_stat"] == pytest.approx(u, abs=1e-6)
    n, na, nb = len(a) + len(b), len(a), len(b)
    t = ca + cb
    tie = np.sum(t**3 - t) / (n * (n - 1.0))
    var = na * nb / 12.0 * ((n + 1.0) - tie)
    z = (u - na * nb / 2.0) / math.sqrt(var)
    # The operator emits z rounded to 6 dp.
    assert row["z_score"] == pytest.approx(z, abs=5e-7)
