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


def test_cli_verify_pass_and_unknown():
    from aics_dask_utils_spark.__main__ import main

    assert main(["verify", "no_such_plan"]) == 2
