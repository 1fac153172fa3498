"""Fleet-wide physical-plan audit: no query may introduce a scale
red flag (cartesian, BNLJ, row-at-a-time Python UDF, or — since r9 — a
single-partition WindowExec, detected structurally as a Window whose
subtree's first exchange is SinglePartition) unless its SURVEY §2 row /
docstring declares it bounded and plans/audit.py's ALLOWLIST records why.
One sweep also proves every allowlist entry still fires — a stale entry
(pattern fixed, query renamed) fails rather than silently waiving."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.plans.audit import ALLOWLIST, audit_all


def test_no_undeclared_red_flags_and_no_stale_waivers(spark):
    hits, waived = audit_all(spark, SF_SMOKE)
    assert not hits, "\n".join(
        f"{h.query}: {h.flag} ({h.why_flagged})" for h in hits
    )
    stale = set(ALLOWLIST) - waived
    assert not stale, f"allowlist entries that no longer fire: {stale}"
