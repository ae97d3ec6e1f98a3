"""CLI surface: list must enumerate the registry without a SparkSession."""

from aics_dask_utils_spark.__main__ import main


def test_cli_list_runs_without_spark(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out
    assert "dedup_minhash_lsh" in out


def test_cli_list_tag_filter(capsys):
    assert main(["list", "--tag", "graph"]) == 0
    out = capsys.readouterr().out
    assert "graph_pagerank_nations" in out
    assert "q1_pricing_summary" not in out


def test_cli_unknown_plan_is_an_error(capsys):
    assert main(["explain", "no_such_plan"]) == 2


def test_cli_verify_unknown_plan():
    assert main(["verify", "no_such_plan"]) == 2


def test_cli_verify_pass_and_fail_paths(monkeypatch, capsys):
    """Exercise the verify branch itself (exit 0 + PASS wording on
    success, exit 1 + FAIL on mismatch) with the oracle runner and the
    session factory stubbed, so the test stays Spark-free and fast."""
    import aics_dask_utils_spark.__main__ as cli
    import aics_dask_utils_spark.session as session
    import aics_dask_utils_spark.testing as testing

    class _FakeSpark:
        def stop(self):
            pass

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: _FakeSpark())
    calls = []
    monkeypatch.setattr(
        testing,
        "run_plan_vs_oracle",
        lambda spark, name, sf_dir, **k: calls.append((name, sf_dir)),
    )
    assert cli.main(["verify", "q1_pricing_summary", "--sf-dir", "/x"]) == 0
    assert calls == [("q1_pricing_summary", "/x")]
    assert "PASS q1_pricing_summary (oracle hash-match" in capsys.readouterr().out

    def _boom(*a, **k):
        raise AssertionError("hash mismatch")

    monkeypatch.setattr(testing, "run_plan_vs_oracle", _boom)
    assert cli.main(["verify", "q1_pricing_summary"]) == 1
    assert "FAIL q1_pricing_summary" in capsys.readouterr().err
