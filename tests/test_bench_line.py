"""The driver-facing bench stdout line must fit the driver's tail capture.

Every BENCH_r01..r11.json landed with ``"parsed": null`` because the driver
keeps only the last 2000 chars of bench.py stdout and the full-registry
per-query dict is ~10 KB. bench.format_bench_line guarantees the printed
line fits; these tests lock that contract against registry growth.
"""

from __future__ import annotations

import json

from bench import _TAIL_BUDGET, HEADLINE_QUERIES, format_bench_line


def _payload(n_queries: int) -> dict:
    queries = {f"some_long_operator_name_{i:04d}": round(0.123 + i * 0.001, 3)
               for i in range(n_queries)}
    # make sure the headline names are present, as in a real full sweep
    for name in HEADLINE_QUERIES:
        queries[name] = 1.234
    return {
        "metric": "total_wall_clock_all_queries",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "n_queries": len(queries),
        "n_failed": 0,
        "repeats": 3,
        "isolated": [f"some_long_operator_name_{i:04d}" for i in range(20)],
    }


def test_small_run_prints_full_map():
    payload = _payload(5)
    line = format_bench_line(payload)
    assert len(line) <= _TAIL_BUDGET
    parsed = json.loads(line)
    assert parsed == payload  # untouched when it fits


def test_full_registry_run_fits_tail_budget():
    payload = _payload(450)  # registry headroom: today it is ~408
    line = format_bench_line(payload)
    assert len(line) <= _TAIL_BUDGET, len(line)
    parsed = json.loads(line)
    # aggregate metric intact
    assert parsed["metric"] == "total_wall_clock_all_queries"
    assert parsed["value"] == payload["value"]
    assert parsed["n_queries"] == payload["n_queries"]
    assert parsed["n_failed"] == 0
    # headline queries present with their real timings
    assert parsed["queries_full"] == "BENCH_FULL.json"
    assert parsed["queries"]  # never empty in practice
    for name, t in parsed["queries"].items():
        assert payload["queries"][name] == t
    # flagship survives any back-trimming
    assert "flagship_star_revenue" in parsed["queries"]


def test_pathologically_long_isolated_list_still_fits():
    payload = _payload(450)
    payload["isolated"] = [f"isolated_row_with_a_long_name_{i:03d}" for i in range(120)]
    line = format_bench_line(payload)
    assert len(line) <= _TAIL_BUDGET
    assert json.loads(line)["value"] == payload["value"]


def test_headline_carries_budget_summary():
    """r12 judge task 5: the printed line must carry the vs-budget headline
    (median_vs_budget + worst5) so the judge never needs the full map."""
    payload = _payload(450)
    payload["median_vs_budget"] = 0.885
    payload["worst5"] = {
        f"worst_offender_{i}": {"sec": 9.9, "vs_budget": 1.9} for i in range(5)
    }
    line = format_bench_line(payload)
    assert len(line) <= _TAIL_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["median_vs_budget"] == 0.885
    assert len(parsed["worst5"]) == 5
    assert parsed["queries_full"] == "BENCH_FULL.json"


def test_no_headline_names_still_fits():
    """r12 advisor (low): with none of HEADLINE_QUERIES in the payload and a
    long isolated list, the old shrink loop had nothing to pop and could
    return an over-budget line. The final fallback must drop queries/isolated
    entirely; the aggregate metric survives unconditionally."""
    queries = {f"an_extremely_long_isolated_operator_name_{i:04d}": 0.5
               for i in range(400)}
    payload = {
        "metric": "total_wall_clock_all_queries",
        "value": 200.0,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "n_queries": len(queries),
        "n_failed": 0,
        "repeats": 3,
        "isolated": [f"an_extremely_long_isolated_operator_name_{i:04d}"
                     for i in range(200)],
        "worst5": {
            f"an_extremely_long_isolated_operator_name_{i:04d}_padded_far_"
            f"beyond_any_reasonable_width_to_force_every_shrink_step": {
                "sec": 9.9, "vs_budget": 1.9,
            }
            for i in range(5)
        },
    }
    line = format_bench_line(payload)
    assert len(line) <= _TAIL_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "total_wall_clock_all_queries"
    assert parsed["value"] == 200.0
    assert parsed["n_queries"] == 400


def test_headline_names_are_registered():
    from wikipedia_org_xmldump_importer_spark.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    missing = [n for n in HEADLINE_QUERIES if n not in REGISTRY]
    assert not missing, f"headline names not in registry: {missing}"
