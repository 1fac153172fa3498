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


def test_partnerless_middle_indices_are_dropped(spark):
    """Series with excl+1 <= n_sub < 2*excl (11-13 days at w=7, excl=4):
    middle subsequence indices i in [n_sub-excl, excl) have no partner
    with |i-j| >= excl. The join form emits no row for them, so the
    kernel must drop them too — not emit sentinel distances or an
    arbitrary nn_day (the pre-r10 bug)."""
    # m=12 -> n_sub=6; valid pairs: (0,4) (0,5) (1,5); i=2,3 partnerless
    v12 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 20]
    # m=11 -> n_sub=5; only valid pair: (0,4); i=1,2,3 partnerless
    v11 = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    rows = [("m12", d, y) for d, y in enumerate(v12)]
    rows += [("m11", d, y) for d, y in enumerate(v11)]
    daily = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "day", "y"])
    )
    out = profile_daily(daily).collect()
    big = (1 << 63) - 1
    assert all(r.mp_dist2 < big for r in out)
    m12 = {r.day: r for r in out if r.event_type == "m12"}
    assert sorted(m12) == [0, 1, 4, 5]  # days 2,3 dropped
    # hand-computed exact distances on v12
    assert (m12[0].nn_day, m12[0].mp_dist2) == (4, 112)
    assert (m12[1].nn_day, m12[1].mp_dist2) == (5, 240)
    assert (m12[4].nn_day, m12[4].mp_dist2) == (0, 112)
    assert (m12[5].nn_day, m12[5].mp_dist2) == (1, 240)
    # flags chosen among SURVIVORS: motif = min d2 earliest (day 0),
    # discord = max d2 earliest (day 1)
    assert [d for d in sorted(m12) if m12[d].is_motif] == [0]
    assert [d for d in sorted(m12) if m12[d].is_discord] == [1]
    m11 = {r.day: r for r in out if r.event_type == "m11"}
    assert sorted(m11) == [0, 4]
    assert m11[0].nn_day == 4 and m11[4].nn_day == 0
