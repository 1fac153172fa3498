"""Unit tests for the as-of join composite (SURVEY §2.3 j7, §4.3).

The oracle-parity check (join_asof vs DuckDB ASOF JOIN) exercises the happy
path; these tests pin the semantic corners the oracle data never hits:
a legitimately-NULL carry value on the LATEST match must be carried as NULL
(not skipped in favor of an older row), and ties at identical timestamps
must resolve by the declared tiebreak.
"""

from __future__ import annotations

from datetime import datetime

from wikipedia_org_xmldump_importer_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_null_carry_value_is_preserved(spark):
    """The latest reference row carries a NULL value: ASOF semantics say the
    probe must receive that NULL — a bare last(..., ignorenulls) would skip
    the row and silently carry the OLDER non-null value instead."""
    ref = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 10.0, 1),
            (1, _ts("2024-01-02T00:00:00"), None, 2),  # latest match, NULL value
        ],
        "k long, rts timestamp, val double, rid long",
    )
    probe = spark.createDataFrame(
        [(1, _ts("2024-01-03T00:00:00"))], "k long, pts timestamp"
    )
    got = asof_join(
        probe, ref, key="k", probe_ts="pts", ref_ts="rts",
        carry={"val": "matched_val"}, ref_tiebreak="rid",
    ).collect()
    assert len(got) == 1
    assert got[0].matched_val is None  # NOT 10.0


def test_asof_no_earlier_match_is_null(spark):
    ref = spark.createDataFrame(
        [(1, _ts("2024-06-01T00:00:00"), 5.0, 1)],
        "k long, rts timestamp, val double, rid long",
    )
    probe = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], "k long, pts timestamp"
    )
    got = asof_join(
        probe, ref, key="k", probe_ts="pts", ref_ts="rts",
        carry={"val": "matched_val"}, ref_tiebreak="rid",
    ).collect()
    assert len(got) == 1 and got[0].matched_val is None


def test_asof_equal_ts_matches_and_tiebreaks(spark):
    """reference at exactly probe ts matches (<=); among equal (key, ts)
    reference rows the LARGEST tiebreak id wins (last in window order)."""
    ref = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1.0, 1),
            (1, _ts("2024-01-01T00:00:00"), 2.0, 2),
        ],
        "k long, rts timestamp, val double, rid long",
    )
    probe = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], "k long, pts timestamp"
    )
    got = asof_join(
        probe, ref, key="k", probe_ts="pts", ref_ts="rts",
        carry={"val": "matched_val"}, ref_tiebreak="rid",
    ).collect()
    assert len(got) == 1 and got[0].matched_val == 2.0
