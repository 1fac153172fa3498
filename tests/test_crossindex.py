"""tests consume the generated cross-index (r9 verdict task 8): the four
hand-maintained ledgers (SURVEY §2, registry, audit waivers, bench
budgets) stitched by tools/crossindex.py must agree with the live
registry — so reading repo state needs ONE artifact, and the stitching
logic itself is contract-checked."""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from crossindex import build_index  # noqa: E402

from wikipedia_org_xmldump_importer_spark.plans.audit import (  # noqa: E402
    ALLOWLIST,
)
from wikipedia_org_xmldump_importer_spark.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)

_ensure_loaded()
DOC = build_index()
BY_NAME = {r["name"]: r for r in DOC["rows"]}


def test_covers_registry_exactly_once():
    reg_rows = [r["name"] for r in DOC["rows"] if r["registered"]]
    assert len(reg_rows) == len(set(reg_rows))
    assert set(reg_rows) == set(REGISTRY)


def test_every_registered_row_has_survey_id_and_budgets():
    for r in DOC["rows"]:
        if not r["registered"]:
            continue
        assert r["survey_id"], f"{r['name']}: registered but not a SURVEY §2 row"
        assert r["budget_sf01"] is not None, f"{r['name']}: no BENCH.json budget"
        assert r["bench_sf1"] is not None, f"{r['name']}: no BENCH_SF1.json row"


def test_component_rows_carry_no_oracle_or_budget():
    for r in DOC["rows"]:
        if r["registered"]:
            continue
        assert r["oracle"] is None
        assert r["budget_sf01"] is None and r["bench_sf1"] is None
        # components are never driver-attested (they have no queries() entry)
        assert r["attested_round"] is None


def test_waivers_attach_to_registered_rows():
    for (name, flag) in ALLOWLIST:
        row = BY_NAME.get(name)
        assert row is not None and row["registered"], (
            f"waiver ({name}, {flag}) references a non-registered name"
        )
        assert flag in row["waivers"]
    n_entries = sum(len(r["waivers"]) for r in DOC["rows"])
    assert n_entries == len(ALLOWLIST)


def test_attestation_is_consistent():
    for r in DOC["rows"]:
        if r["attested_round"] is None:
            continue
        assert r["registered"], f"{r['name']}: attested but not registered"
        # rows-only queries never hash-match by definition — a green hash
        # row for one would mean the artifact and the declaration disagree
        assert r["oracle"] == "sql", (
            f"{r['name']}: driver hash-green but declared {r['oracle']}"
        )
    assert DOC["summary"]["attested"] >= 309  # the r9 cumulative floor


def test_summary_matches_rows():
    s = DOC["summary"]
    assert s["rows"] == len(DOC["rows"])
    assert s["registered"] == sum(1 for r in DOC["rows"] if r["registered"])
    assert s["sql_oracle"] + s["rows_only"] == s["registered"]
    assert s["components"] == s["rows"] - s["registered"]
