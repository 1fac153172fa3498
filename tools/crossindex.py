"""One generated cross-index over the four hand-maintained ledgers
(r9 verdict task 8): SURVEY §2 rows <-> queries registry <-> plan-audit
waivers <-> bench budgets <-> driver attestation.

Each of those lists is individually test-enforced, but reading the repo's
state means stitching them by hand across SURVEY.md, queries/__init__.py,
plans/audit.py, BENCH.json, BENCH_SF1.json and nine CORRECTNESS files.
This tool emits the stitched table ONCE, as data:

    python tools/crossindex.py              # JSON: {"rows": [...], "summary": {...}}
    python tools/crossindex.py --markdown   # same table as markdown

Row fields:
    name          query / component name (SURVEY §2 backtick token)
    survey_id     §2 row id (s1, j7, x299, k4, ...) or None if not a §2 row
    registered    True if a queries() entry exists
    oracle        'sql' | 'rows-only' | None (component rows)
    budget_sf01   BENCH.json per-query budget seconds (None for components)
    bench_sf1     BENCH_SF1.json measured seconds (None for components)
    attested_round  first round with a green driver hash row, or None
    waivers       [plan-audit flags declared acceptable for this query]

The table is CONSUMED BY TESTS (tests/test_crossindex.py): registry
coverage, waiver attachment, budget lockstep and attestation consistency
are asserted against this one artifact, so the stitching logic itself is
contract-checked.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _survey_rows(text: str) -> dict[str, str]:
    """name -> §2 row id, parsed from the §2 tables (same cell convention
    test_survey_registry_sync uses: id in cells[1], `name` in cells[2])."""
    start = text.index("## §2")
    end = text.index("## §3")
    rows: dict[str, str] = {}
    for line in text[start:end].splitlines():
        if not line.startswith("|"):
            continue
        cells = line.split("|")
        if len(cells) < 3:
            continue
        names = re.findall(r"`([a-z][a-z0-9_]*)`", cells[2])
        row_id = cells[1].strip()
        for name in names:
            if re.fullmatch(r"[a-z]+[0-9]+(/x[0-9]+)?|x[0-9]+|k[0-9]+", row_id):
                rows[name] = row_id
    return rows


def _first_attested(root: Path) -> dict[str, int]:
    """name -> earliest round number with a green (rows+schema+hash) row."""
    out: dict[str, int] = {}
    # Glob r* (not the old r0* that dropped rounds 10+), validate the name,
    # and walk in round order so "earliest green" is truly earliest.
    arts = [
        p
        for p in root.glob("CORRECTNESS_r*.json")
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", p.name)
    ]
    for art in sorted(arts, key=lambda p: int(re.search(r"_r0*(\d+)", p.name).group(1))):
        rnd = int(re.search(r"_r0*(\d+)", art.name).group(1))
        for name, row in json.loads(art.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and name not in out
            ):
                out[name] = rnd
    return out


def build_index(root: Path = ROOT) -> dict:
    from wikipedia_org_xmldump_importer_spark.plans.audit import ALLOWLIST
    from wikipedia_org_xmldump_importer_spark.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    survey = _survey_rows((root / "SURVEY.md").read_text())
    budgets = json.loads((root / "BENCH.json").read_text())["queries"]
    sf1 = json.loads((root / "BENCH_SF1.json").read_text())["queries"]
    attested = _first_attested(root)
    waivers: dict[str, list[str]] = {}
    for (name, flag) in ALLOWLIST:
        waivers.setdefault(name, []).append(flag)

    names = sorted(set(survey) | set(REGISTRY))
    rows = []
    for name in names:
        reg = REGISTRY.get(name)
        rows.append(
            {
                "name": name,
                "survey_id": survey.get(name),
                "registered": reg is not None,
                "oracle": (
                    None if reg is None
                    else ("sql" if reg.oracle is not None else "rows-only")
                ),
                "budget_sf01": budgets.get(name),
                "bench_sf1": sf1.get(name),
                "attested_round": attested.get(name),
                "waivers": sorted(waivers.get(name, [])),
            }
        )
    n_reg = sum(1 for r in rows if r["registered"])
    summary = {
        "rows": len(rows),
        "registered": n_reg,
        "sql_oracle": sum(1 for r in rows if r["oracle"] == "sql"),
        "rows_only": sum(1 for r in rows if r["oracle"] == "rows-only"),
        "components": len(rows) - n_reg,
        "attested": sum(1 for r in rows if r["attested_round"] is not None),
        "waived_queries": len(waivers),
        "waiver_entries": len(ALLOWLIST),
    }
    return {"rows": rows, "summary": summary}


def _markdown(doc: dict) -> str:
    head = (
        "| name | §2 id | oracle | budget sf0.1 | sf1 sec | attested | waivers |\n"
        "|---|---|---|---|---|---|---|"
    )
    lines = [head]
    for r in doc["rows"]:
        lines.append(
            "| `{name}` | {sid} | {oracle} | {b} | {s1} | {att} | {w} |".format(
                name=r["name"],
                sid=r["survey_id"] or "",
                oracle=r["oracle"] or "component",
                b="" if r["budget_sf01"] is None else r["budget_sf01"],
                s1="" if r["bench_sf1"] is None else r["bench_sf1"],
                att="" if r["attested_round"] is None else f"r{r['attested_round']}",
                w=", ".join(r["waivers"]),
            )
        )
    s = doc["summary"]
    lines.append(
        f"\n{s['rows']} rows: {s['registered']} registered "
        f"({s['sql_oracle']} sql-oracle, {s['rows_only']} rows-only), "
        f"{s['components']} components; {s['attested']} driver-attested; "
        f"{s['waiver_entries']} waivers on {s['waived_queries']} queries."
    )
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args(argv)
    doc = build_index()
    print(_markdown(doc) if args.markdown else json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
