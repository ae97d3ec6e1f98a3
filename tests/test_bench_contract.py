"""The driver-facing bench stdout contract.

BENCH_r04-r08 were all ``parsed: null`` because the single full-record
JSON line (~8 KB of per-query maps) outgrew the driver's 2000-char
tail capture (r8 VERDICT, What's-wrong #1). The repair is a COMPACT
summary printed as the FINAL stdout line; these tests freeze that
contract without running any Spark:

- the compact summary of a realistic full record stays comfortably
  under the 2000-char tail window,
- it parses back to the scalar fields the driver's perf gate reads,
- it never carries a per-query map (the thing that outgrew the tail).
"""

import json

from bench import _compact_summary


def _realistic_record(n_queries: int = 300) -> dict:
    """A record larger than any plausible future headline set (r9 has
    74 in-session + 73 isolated queries; model 300 of each)."""
    return {
        "metric": "headline_queries_total_sec",
        "value": 49.9615,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"some_rather_long_plan_name_{i}": i * 0.013 for i in range(n_queries)},
        "queries_isolated": {f"some_rather_long_plan_name_{i}": i * 0.017 for i in range(n_queries)},
        "isolated_total_sec": 57.2246,
        "isolated_groups_skipped": 0,
        "isolated_rotation": 9,
        "isolated_n_groups": 11,
    }


def test_compact_summary_fits_driver_tail_capture():
    line = json.dumps(_compact_summary(_realistic_record()))
    # The driver keeps the last 2000 chars; leave real margin so field
    # additions can't silently re-break the gate.
    assert len(line) < 1000, f"compact line grew to {len(line)} chars"


def test_compact_summary_parses_and_keeps_scalar_fields():
    rec = _realistic_record()
    out = json.loads(json.dumps(_compact_summary(rec)))
    for k in (
        "metric",
        "value",
        "unit",
        "sf",
        "isolated_total_sec",
        "isolated_groups_skipped",
        "isolated_rotation",
        "isolated_n_groups",
    ):
        assert out[k] == rec[k], k
    assert out["n_queries"] == len(rec["queries"])
    assert out["n_queries_isolated"] == len(rec["queries_isolated"])
    assert out["full_record"] == "docs/bench_full_latest.json"


def test_compact_summary_drops_every_mapping():
    out = _compact_summary(_realistic_record())
    assert not any(isinstance(v, dict) for v in out.values())
    assert "queries" not in out and "queries_isolated" not in out


def test_topn_line_plus_summary_fit_tail_together():
    """Round-13 repair (r12 VERDICT Next-round #2): the top-N per-query
    line prints immediately before the final summary; BOTH must fit the
    driver's 2000-char tail capture together, whatever the headline
    list grows to."""
    from bench import _topn_line

    rec = _realistic_record()
    topn = _topn_line(rec)
    both = json.dumps(topn) + "\n" + json.dumps(_compact_summary(rec))
    assert len(both) < 1900, f"tail lines grew to {len(both)} chars"
    # it must carry the MOST EXPENSIVE queries of each pass
    assert len(topn["queries"]) == 12
    worst = max(rec["queries"], key=rec["queries"].get)
    assert worst in topn["queries"]
    assert len(topn["queries_isolated"]) == 12


def test_full_record_written_per_cpu_count():
    """The driver benches at two core counts; the per-CPU record file
    must keep the first run's per-query map from being overwritten by
    the second (r12 VERDICT What's-wrong #1)."""
    import bench

    assert bench._FULL_RECORD_CPU_PATH == f"docs/bench_full_c{bench.CPUS}.json"
    assert bench._FULL_RECORD_CPU_PATH != bench._FULL_RECORD_PATH
