"""Fleet-wide physical-plan audit: no query may introduce a scale
red flag (cartesian, BNLJ, row-at-a-time Python UDF) unless its SURVEY §2
row declares it bounded and plans/audit.py's ALLOWLIST records why."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.plans.audit import ALLOWLIST, audit_all


def test_no_undeclared_scale_red_flags(spark):
    hits = audit_all(spark, SF_SMOKE)
    assert not hits, "\n".join(
        f"{h.query}: {h.flag} ({h.why_flagged})" for h in hits
    )


def test_allowlist_entries_still_exist(spark):
    # a stale allowlist entry (query renamed/removed) would silently waive
    # the audit for nothing — keep it in sync with the registry
    from wikipedia_org_xmldump_importer_spark.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    for query, _flag in ALLOWLIST:
        assert query in REGISTRY, f"stale allowlist entry: {query}"
