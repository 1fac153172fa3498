"""Tests for tools/preflight.py (r9 verdict task 5).

The untracked-artifact gate exists because rounds 7–9 each shipped a red
tree the same way: the driver wrote ``CORRECTNESS_r{N}.json`` /
``BENCH_r{N}.json`` after the round-final commit, leaving the committed
DRIVER_PRIORITY window one rotation stale. The gate must catch exactly
that state — an untracked driver artifact in the worktree — and must NOT
fire on tracked artifacts or unrelated untracked files.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import preflight  # noqa: E402


def _git(repo: Path, *args: str) -> None:
    subprocess.run(
        ["git", *args], cwd=repo, check=True, capture_output=True,
        env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
             "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
             "HOME": str(repo), "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )


def _make_repo(tmp_path: Path) -> Path:
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    (repo / "tracked.txt").write_text("x\n")
    _git(repo, "add", "tracked.txt")
    _git(repo, "commit", "-qm", "init")
    return repo


def test_catches_untracked_driver_artifacts(tmp_path):
    """The exact r7/r8/r9 failure state: driver JSONs unknown to git."""
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r99.json").write_text(json.dumps({"q": {}}))
    (repo / "BENCH_r99.json").write_text(json.dumps({"metric": "x"}))
    bad = preflight.check_untracked_artifacts(repo)
    assert sorted(bad) == ["BENCH_r99.json", "CORRECTNESS_r99.json"]


def test_tracked_artifacts_pass(tmp_path):
    """Once committed, the same files must not trip the gate."""
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r99.json").write_text("{}")
    _git(repo, "add", "CORRECTNESS_r99.json")
    _git(repo, "commit", "-qm", "artifact")
    assert preflight.check_untracked_artifacts(repo) == []


def test_unrelated_untracked_files_pass(tmp_path):
    """Scratch files and non-driver JSONs must not fire the gate."""
    repo = _make_repo(tmp_path)
    (repo / "scratch.json").write_text("{}")
    (repo / "CORRECTNESS_notes.md").write_text("x")
    (repo / "BENCH_LOCAL_r99.json").write_text("{}")  # local, not driver
    assert preflight.check_untracked_artifacts(repo) == []


def test_staged_but_uncommitted_artifact_passes(tmp_path):
    """A staged artifact is visible to the commit being made — fine."""
    repo = _make_repo(tmp_path)
    (repo / "BENCH_r99.json").write_text("{}")
    _git(repo, "add", "BENCH_r99.json")
    assert preflight.check_untracked_artifacts(repo) == []


def test_live_repo_has_no_stale_untracked_artifacts():
    """The live-worktree assertion, re-scoped (r10 verdict item 3): the
    driver drops the new round's artifacts AFTER the round-final commit, so
    demanding a fully clean tree here is red at judge time every round by
    construction. What must never exist is an untracked artifact from a
    round git already tracks (or older) — that is the r7–r9 rotated-without-
    committing-evidence state. The strict all-artifacts check remains the
    COMMIT gate inside tools/preflight.py's run_fast_gates."""
    assert preflight.stale_untracked_artifacts(ROOT) == []


def test_stale_filter_semantics(tmp_path):
    """Fixture proof of the re-scoped gate: an untracked artifact NEWER than
    everything tracked passes (the post-commit driver drop); an untracked
    artifact at or below the newest tracked round fails."""
    repo = _make_repo(tmp_path)
    (repo / "CORRECTNESS_r09.json").write_text("{}")
    _git(repo, "add", "CORRECTNESS_r09.json")
    _git(repo, "commit", "-qm", "r9 artifacts")

    # Driver drop after the round-final commit: newer round, acceptable.
    (repo / "CORRECTNESS_r10.json").write_text("{}")
    (repo / "BENCH_r10.json").write_text("{}")
    assert preflight.stale_untracked_artifacts(repo) == []
    # ... but the strict commit gate still sees them.
    assert len(preflight.check_untracked_artifacts(repo)) == 2

    # An untracked artifact from an already-tracked round is always stale.
    (repo / "CORRECTNESS_r08.json").write_text("{}")
    assert preflight.stale_untracked_artifacts(repo) == ["CORRECTNESS_r08.json"]
