"""Pre-flight for the DRIVER_PRIORITY rotation (r7 verdict task 6).

Prints the expected 50-slot driver window — the 50 oldest
(REGISTRATION_LEDGER order) SQL-oracle queries with no green row in any
committed ``CORRECTNESS_r*.json`` — as a ready-to-paste Python tuple body,
plus a drift diagnosis against the currently-committed ``DRIVER_PRIORITY``.

This is the exact derivation ``tests/test_registry.py::
test_driver_window_covers_oldest_never_attested`` enforces; running it
BEFORE committing a round's artifacts kills the twice-seen failure mode
(r6: one-batch-stale audit log; r7: stale window tuple) where the driver's
CORRECTNESS artifact lands after the final commit and silently ages the
tuple by one rotation.

Usage::

    python tools/next_window.py            # report + paste-ready tuple
    python tools/next_window.py --check    # exit 1 on drift (CI pre-flight)
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def correctness_artifacts(root: Path) -> list[Path]:
    """All COMMITTED driver correctness artifacts, sorted by round number.

    Two regressions shaped this function:

    * r10 (judge + advisor): the old glob ``CORRECTNESS_r0*.json`` matched
      rounds 01-09 only, so round-10+ attestations were silently ignored and
      the window re-proposed already-green queries. Validate the full name
      and sort numerically.
    * r12 (judge): the driver drops ``CORRECTNESS_r{N}.json`` UNTRACKED after
      the round-final commit, so a worktree glob sees one more round than the
      committed tuple was derived from and the judge's pytest run goes red on
      a window that was correct at commit time. Enumerate via
      ``git ls-files`` so only committed artifacts count; fall back to a
      filesystem glob only when ``root`` is not a git worktree (fixture
      tmp dirs).
    """
    try:
        # :(glob,top) anchors the pathspec to the repo ROOT (r13 advisor):
        # a bare 'CORRECTNESS_r*.json' git glob crosses '/' by default, so a
        # tracked copy nested under e.g. tests/fixtures/ would silently join
        # the attestation ledger. Belt-and-braces: also drop any name that
        # still contains a separator before the fullmatch check.
        out = subprocess.run(
            [
                "git",
                "-C",
                str(root),
                "ls-files",
                "--",
                ":(glob,top)CORRECTNESS_r*.json",
            ],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        names = [
            ln.strip()
            for ln in out.splitlines()
            if ln.strip() and "/" not in ln.strip()
        ]
        # exists() guard (r13 review): ls-files reports INDEX entries, so a
        # tracked artifact rm'd from disk (partial checkout, manual delete)
        # would otherwise crash the read_text in attested_names. A staged-
        # but-uncommitted artifact does count — staging is an intentional
        # act, unlike the driver's untracked post-commit drop.
        arts = [
            root / n
            for n in names
            if re.fullmatch(r"CORRECTNESS_r\d+\.json", Path(n).name)
            and (root / n).exists()
        ]
    except (OSError, subprocess.CalledProcessError):
        arts = [
            p
            for p in root.glob("CORRECTNESS_r*.json")
            if re.fullmatch(r"CORRECTNESS_r\d+\.json", p.name)
        ]
    return sorted(arts, key=lambda p: int(re.search(r"_r0*(\d+)", p.name).group(1)))


def attested_names(root: Path = ROOT) -> set[str]:
    """Union of all green (rows+schema+hash) rows across committed artifacts."""
    out: set[str] = set()
    for art in correctness_artifacts(root):
        for name, row in json.loads(art.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out.add(name)
    return out


def expected_window() -> tuple[str, ...]:
    from wikipedia_org_xmldump_importer_spark.queries import REGISTRATION_LEDGER
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    attested = attested_names()
    never = [
        n
        for n in REGISTRATION_LEDGER
        if REGISTRY[n].oracle is not None and n not in attested
    ]
    if len(never) >= 50:
        return tuple(never[:50])
    refill = [
        n
        for n in REGISTRATION_LEDGER
        if REGISTRY[n].oracle is not None and n in attested
    ]
    return tuple(never + refill[: 50 - len(never)])


def main(argv: list[str]) -> int:
    from wikipedia_org_xmldump_importer_spark.queries import (
        DRIVER_PRIORITY,
        REGISTRATION_LEDGER,
    )
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    attested = attested_names()
    sql_rows = [n for n in REGISTRATION_LEDGER if REGISTRY[n].oracle is not None]
    never = [n for n in sql_rows if n not in attested]
    exp = expected_window()
    drift = exp != DRIVER_PRIORITY

    print(
        f"registry: {len(REGISTRY)} queries, {len(sql_rows)} SQL-oracle; "
        f"attested: {len(attested & set(sql_rows))}; never-attested: {len(never)}"
    )
    print(f"window status: {'STALE — rotate before committing' if drift else 'in sync'}")
    if "--check" in argv:
        return 1 if drift else 0
    print("\nexpected DRIVER_PRIORITY body (paste into queries/__init__.py):\n")
    for n in exp:
        print(f'    "{n}",')
    if never[50:]:
        print(f"\nqueued after this window ({len(never) - 50} remaining):")
        print("  " + ", ".join(never[50:]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
