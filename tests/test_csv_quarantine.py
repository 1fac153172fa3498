"""s19: malformed-CSV ingest contracts (SURVEY §2.1).

One crafted feed with three defect classes — wrong arity, un-castable
type, embedded delimiter without quoting — drives all three modes:
  * quarantine: good rows typed + bad rows captured with their RAW line
    (count conservation: good + quarantined == physical lines);
  * DROPMALFORMED: bad rows silently gone, good count matches;
  * FAILFAST: the scan raises on first touch.
"""

from __future__ import annotations

import pytest

from wikipedia_org_xmldump_importer_spark.sources.csv_json import (
    scan_csv_dropmalformed,
    scan_csv_failfast,
    scan_csv_quarantine,
)

_SCHEMA = "id BIGINT, name STRING, amount DOUBLE"

_FEED = """id,name,amount
1,alpha,10.5
2,beta,20.25
not_a_number,gamma,30.0
4,delta
5,ep,silon,50.0
6,zeta,60.75
"""
# line 3: id fails BIGINT cast; line 4: missing column; line 5: extra
# column (unquoted embedded comma). 3 good rows, 3 bad.


@pytest.fixture()
def feed(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(_FEED)
    return str(p)


def test_quarantine_splits_and_conserves_rows(spark, feed):
    good, quarantine = scan_csv_quarantine(spark, feed, _SCHEMA)
    g = good.collect()
    q = quarantine.collect()
    assert len(g) == 3 and len(q) == 3
    assert sorted(r.id for r in g) == [1, 2, 6]
    # the quarantine carries the RAW line — the evidence for fixing the feed
    raws = sorted(r.raw_line for r in q)
    assert any("not_a_number" in r for r in raws)
    assert any(r == "4,delta" for r in raws)
    assert any("silon" in r for r in raws)
    # typed schema survived on the good frame
    assert [f.name for f in good.schema.fields] == ["id", "name", "amount"]
    assert good.schema["amount"].dataType.typeName() == "double"


def test_dropmalformed_drops_silently(spark, feed):
    df = scan_csv_dropmalformed(spark, feed, _SCHEMA)
    # CAVEAT encoded: df.count() would return 6, not 3 — column pruning
    # hands the parser an EMPTY required schema, nothing fails to parse,
    # so DROPMALFORMED drops nothing (documented Spark CSV behavior:
    # "malformed" is relative to the columns actually read). Any
    # row-count contract over a DROPMALFORMED scan must touch the
    # columns whose parse defines malformedness.
    rows = df.collect()
    assert sorted(r.id for r in rows) == [1, 2, 6]
    assert df.count() == 6  # the pruning trap, pinned so a behavior
    # change in a future Spark shows up as a test diff, not silently


def test_failfast_raises_on_first_bad_row(spark, feed):
    df = scan_csv_failfast(spark, feed, _SCHEMA)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
