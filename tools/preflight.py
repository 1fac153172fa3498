"""Pre-commit gate (r8 verdict task 8) — run me before EVERY round-final
commit.

Rounds 7 and 8 both shipped red trees for the same reason: operators were
registered in the final hour and the contract artifacts (SURVEY §2 rows,
BENCH.json / BENCH_SF1.json budget rows, DRIVER_PRIORITY rotation, plan-
audit waivers) were left for "next round". Every one of those failures is
detectable in seconds WITHOUT a Spark session. This script runs exactly
those checks, fails loudly, and finishes in well under two minutes:

 1. ``tools/next_window.py --check`` — DRIVER_PRIORITY window rotation.
 2. The no-Spark contract tests from tests/test_registry.py:
    registry/ledger sync, SURVEY §2 <-> registry sync (both directions),
    per-row oracle-mode sync, BENCH.json + BENCH_SF1.json lockstep.
 3. (optional) ``--audit name [name ...]`` — plan-audit ONLY the named
    queries (the ones you just added/changed) against sf0.001; the full
    fleet audit lives in the round artifacts, but a new op's un-waived
    BroadcastNestedLoopJoin should never reach a commit.

Usage::

    python tools/preflight.py                       # gates 1 + 2
    python tools/preflight.py --audit my_new_op     # + targeted plan audit
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: the contract tests that need no SparkSession — complete in seconds.
FAST_TESTS = [
    "tests/test_registry.py::test_driver_window_covers_oldest_never_attested",
    "tests/test_registry.py::test_next_window_tool_matches_policy",
    "tests/test_registry.py::test_survey_registry_sync",
    "tests/test_registry.py::test_survey_oracle_mode_sync",
    "tests/test_registry.py::test_oracle_coverage_accounted",
    "tests/test_registry.py::test_bench_budget_rows_in_lockstep",
    "tests/test_registry.py::test_bench_sf1_rows_in_lockstep",
    "tests/test_registry.py::test_driver_window_is_priority_ordered",
]


def check_untracked_artifacts(root: Path = ROOT) -> list[str]:
    """Return driver artifacts present in the worktree but unknown to git.

    r7/r8/r9 all went red the same way: the driver drops
    ``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json`` AFTER the round-final
    commit, so the committed DRIVER_PRIORITY window is derived from one
    fewer round than the worktree sees and the rotation tests disagree at
    judge time. An untracked driver artifact is therefore always an error
    state for a round-final commit: commit it and re-rotate first.
    """
    out = subprocess.run(
        ["git", "status", "--porcelain", "--untracked-files=normal"],
        cwd=root, capture_output=True, text=True,
    ).stdout
    bad: list[str] = []
    for line in out.splitlines():
        if not line.startswith("?? "):
            continue
        name = line[3:].strip()
        stem = name.rsplit("/", 1)[-1]
        if (stem.startswith(("CORRECTNESS_r", "BENCH_r"))
                and stem.endswith(".json")):
            bad.append(name)
    return bad


def stale_untracked_artifacts(root: Path = ROOT) -> list[str]:
    """Untracked driver artifacts that are STALE — i.e. from a round at or
    before the newest round already tracked by git.

    The strict :func:`check_untracked_artifacts` is the right COMMIT gate,
    but asserting it of the live worktree "at all times" is red at judge
    time by construction (r10 verdict item 3): the driver always drops
    ``CORRECTNESS_r{N}.json``/``BENCH_r{N}.json`` AFTER the round-final
    commit, so a judge running pytest sees exactly one untracked artifact
    pair — the brand-new round's, which postdates everything tracked and is
    the next round's job to commit. Those are fine. What is NOT fine (and
    what this returns) is an untracked artifact from a round git already
    knows about or older — that means a rotation happened without
    committing the evidence it consumed, the r7–r9 failure state.
    """
    import re

    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json", "BENCH_r*.json"],
        cwd=root, capture_output=True, text=True,
    ).stdout.split()
    rounds = [
        int(m.group(1))
        for f in tracked
        if (m := re.fullmatch(r"(?:CORRECTNESS|BENCH)_r0*(\d+)\.json", f))
    ]
    newest_tracked = max(rounds, default=0)
    stale: list[str] = []
    for name in check_untracked_artifacts(root):
        stem = name.rsplit("/", 1)[-1]
        m = re.fullmatch(r"(?:CORRECTNESS|BENCH)_r0*(\d+)\.json", stem)
        if m is None or int(m.group(1)) <= newest_tracked:
            stale.append(name)
    return stale


def run_fast_gates() -> int:
    bad = check_untracked_artifacts()
    if bad:
        print("PREFLIGHT FAIL: untracked driver artifact(s) in worktree: "
              + ", ".join(bad)
              + " — `git add` them and re-run tools/next_window.py before "
              "committing (this exact state made r7/r8/r9 red).")
        return 1
    rc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "next_window.py"), "--check"],
        cwd=ROOT,
    ).returncode
    if rc != 0:
        print("PREFLIGHT FAIL: DRIVER_PRIORITY window is stale — "
              "paste the tuple tools/next_window.py printed above.")
        return rc
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "--no-header", *FAST_TESTS],
        cwd=ROOT,
    ).returncode
    if rc != 0:
        print("PREFLIGHT FAIL: contract tests red — fix SURVEY/BENCH/ledger "
              "rows BEFORE committing, not next round.")
    return rc


def run_targeted_audit(names: list[str]) -> int:
    sys.path.insert(0, str(ROOT))
    from wikipedia_org_xmldump_importer_spark.plans.audit import audit_all
    from wikipedia_org_xmldump_importer_spark.session import build_session

    spark = build_session(app_name="preflight-audit")
    try:
        hits, _ = audit_all(spark, "/root/testdata/sf0.001", names=names)
    finally:
        spark.stop()
    for h in hits:
        print(f"PREFLIGHT AUDIT HIT: {h.query}: {h.flag} ({h.why_flagged})")
    if hits:
        print("Fix the plan or add an ALLOWLIST waiver in plans/audit.py "
              "with a bounded-by-construction justification.")
    return 1 if hits else 0


def main(argv: list[str]) -> int:
    audit_names: list[str] = []
    if argv and argv[0] == "--audit":
        audit_names = argv[1:]
        if not audit_names:
            print("--audit requires at least one query name")
            return 2
    rc = run_fast_gates()
    if rc:
        return rc
    if audit_names:
        rc = run_targeted_audit(audit_names)
        if rc:
            return rc
    print("preflight: all gates green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
