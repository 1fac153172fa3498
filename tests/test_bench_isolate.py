"""Fresh-subprocess bench isolation (r13 verdict task 1).

The in-sweep isolation pass ran in the saturated tail of a ~30-min sweep
inside the same JVM and manufactured false regressions two rounds running
(NOTES r13 item 10: dedup_embed_cosine 11.8 s in-sweep vs 1.5 s in a clean
session). bench.isolate_fresh_session re-measures suspects in a NEW
subprocess JVM; these tests lock the subprocess path — command/env shape,
out-file parsing, failure fallback, and one real end-to-end spawn.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import bench


class _FakeProc:
    def __init__(self, returncode=0, stderr=""):
        self.returncode = returncode
        self.stderr = stderr


def test_isolate_builds_fresh_jvm_command(monkeypatch):
    """The child must be `python bench.py <names>` with isolation OFF
    (recursion guard), 5 repeats, the sweep's SF dir, and the payload
    directed at a temp out-file — stdout is NOT the parse surface (the
    printed line legally shrinks past the per-query map)."""
    seen = {}

    def fake_run(cmd, env=None, capture_output=None, text=None, timeout=None):
        seen["cmd"] = cmd
        seen["env"] = env
        with open(env["SPARK_GRAFT_BENCH_OUT"], "w") as fh:
            json.dump(
                {
                    "queries": {
                        "q_slow": 1.23,
                        "q_other": 0.5,
                        "q_failed_in_child": -1.0,
                        "q_not_asked_for": 9.9,
                    }
                },
                fh,
            )
        return _FakeProc()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench.isolate_fresh_session(
        ["q_slow", "q_other", "q_failed_in_child"], "/root/testdata/sf0.1"
    )

    assert seen["cmd"][0] == sys.executable
    assert seen["cmd"][1].endswith("bench.py")
    assert seen["cmd"][2:] == ["q_slow", "q_other", "q_failed_in_child"]
    assert seen["env"]["SPARK_GRAFT_BENCH_ISOLATE"] == "0"
    assert seen["env"]["SPARK_GRAFT_BENCH_REPEATS"] == "5"
    assert seen["env"]["SPARK_GRAFT_SF_DIR"] == "/root/testdata/sf0.1"
    # child-failed (-1) rows and rows we never asked about are dropped
    assert out == {"q_slow": 1.23, "q_other": 0.5}
    # the temp out-file is cleaned up
    assert not os.path.exists(seen["env"]["SPARK_GRAFT_BENCH_OUT"])


def test_isolate_child_failure_keeps_in_sweep_numbers(monkeypatch):
    """Any child failure (nonzero rc, timeout, bad JSON) returns {} — the
    caller keeps the honest in-sweep numbers instead of dropping rows."""
    monkeypatch.setattr(
        bench.subprocess,
        "run",
        lambda *a, **k: _FakeProc(returncode=1, stderr="boom"),
    )
    assert bench.isolate_fresh_session(["q_slow"], "/tmp/sf") == {}

    def raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", raise_timeout)
    assert bench.isolate_fresh_session(["q_slow"], "/tmp/sf") == {}


def test_isolate_empty_suspects_never_spawns(monkeypatch):
    def explode(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("subprocess spawned for empty suspect list")

    monkeypatch.setattr(bench.subprocess, "run", explode)
    assert bench.isolate_fresh_session([], "/tmp/sf") == {}


def test_queries_full_pointer_dropped_with_queries():
    """r13 advisor: when the shrink loop drops 'queries', the dangling
    'queries_full' pointer must go with it."""
    # Payload engineered so the loop must drop queries: no headline names,
    # huge isolated list and worst5 so only the final fallback fits.
    payload = {
        "metric": "total_wall_clock_all_queries",
        "value": 100.0,
        "unit": "sec",
        "queries": {f"very_long_operator_name_number_{i:04d}": 0.5 for i in range(400)},
        "sf": 0.1,
        "n_queries": 400,
        "n_failed": 0,
        "repeats": 3,
        "isolated": [f"very_long_operator_name_number_{i:04d}" for i in range(200)],
        "worst5": {
            f"very_long_operator_name_number_{i:04d}_padded_to_force_the_"
            f"final_fallback_step_of_the_shrink_loop_beyond_the_budget": {
                "sec": 9.9,
                "vs_budget": 1.9,
            }
            for i in range(5)
        },
    }
    line = bench.format_bench_line(payload)
    assert len(line) <= bench._TAIL_BUDGET
    parsed = json.loads(line)
    if "queries" not in parsed:
        assert "queries_full" not in parsed


def test_isolate_real_subprocess_round_trip():
    """The true lock: spawn the real child JVM on one trivial query at the
    smallest SF and get a positive median back. ~1 min of JVM startup —
    the one test that proves the subprocess path end-to-end."""
    out = bench.isolate_fresh_session(
        ["scan_parquet"], "/root/testdata/sf0.001", timeout=600
    )
    assert set(out) == {"scan_parquet"}
    assert out["scan_parquet"] > 0
