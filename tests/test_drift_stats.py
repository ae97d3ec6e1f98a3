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
    a = ev.loc[ev.event_type == "click", "value"].to_numpy()
    b = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
    bins = np.minimum(np.floor(np.concatenate([a, b]) / 5.0).astype(int), 99)
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
