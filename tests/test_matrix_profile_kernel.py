"""Exact equivalence of the diagonal-recurrence matrix-profile kernel
(operators/matrix_profile.py) against the registered O(m^2)-join form
(x315 ts_matrix_profile): un-normalized distances are exact int64 on both
paths, so nearest neighbors, tie-breaks and motif/discord flags must
match row for row — plus a hand-checkable synthetic motif and a
too-short-series edge case."""

from __future__ import annotations

import pandas as pd
from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.operators.matrix_profile import (
    matrix_profile_linear_memory,
    profile_daily,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    ts_matrix_profile,
)


def _keyed(df):
    return {
        (r.event_type, r.day): (r.nn_day, r.mp_dist2, r.is_motif, r.is_discord)
        for r in df.collect()
    }


def test_kernel_matches_join_form_exactly(spark):
    want = _keyed(ts_matrix_profile(spark, SF_SMOKE))
    got = _keyed(matrix_profile_linear_memory(spark, SF_SMOKE))
    assert got == want


def test_synthetic_motif_and_short_series(spark):
    # 'aa': an exactly repeated week (days 0-6 == days 20-26) inside
    # noise — the two copies are each other's nearest neighbors at
    # distance 0 and the EARLIER one is the motif (index tie-break).
    pattern = [5, 9, 2, 7, 4, 8, 6]
    filler = [100, 40, 77, 13, 55, 21, 90, 34, 68, 11, 83, 47, 29]
    series = pattern + filler + pattern + [60, 25, 95]
    rows = [("aa", d, y) for d, y in enumerate(series)]
    # 'bb': shorter than exclusion+window -> no valid non-trivial pair
    rows += [("bb", d, 10 + d) for d in range(9)]
    daily = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "day", "y"])
    )
    out = profile_daily(daily).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    aa = {r.day: r for r in by_type["aa"]}
    assert aa[0].mp_dist2 == 0 and aa[0].nn_day == 20
    assert aa[20].mp_dist2 == 0 and aa[20].nn_day == 0
    assert aa[0].is_motif == 1  # earlier index wins the zero-distance tie
    assert aa[20].is_motif == 0
    assert sum(r.is_motif for r in by_type["aa"]) == 1
    assert sum(r.is_discord for r in by_type["aa"]) == 1
    # every subsequence start is present exactly once
    assert sorted(aa) == list(range(len(series) - 6))
    assert "bb" not in by_type
