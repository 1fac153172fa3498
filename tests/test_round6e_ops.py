"""Invariants for the x175-x177 operator batch: chi-square vs scipy-free
Python replay, incremental-cube merge == rebuild at a second grain, and the
Shapley efficiency axiom + Python-replay of the closed form. All at sf0.001
(smoke grain)."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.queries.merge_ops import (
    cube_incremental_refresh,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    events_ab_chi2,
    events_attribution_shapley,
)


def _md5_variant(uid: int) -> int:
    import hashlib

    return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:3], 16) % 2


def test_chi2_matches_python_replay(spark):
    """Replay the 2×2 Pearson chi² from raw events in pure Python (same
    hash split, same ≥13-purchase conversion rule, same closed form)."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .collect()
    )
    per_user: dict = {}
    for r in ev:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + (
            1 if r.event_type == "purchase" else 0
        )
    cells = {(v, c): 0 for v in (0, 1) for c in (0, 1)}
    for uid, np_ in per_user.items():
        cells[(_md5_variant(uid), 1 if np_ >= 13 else 0)] += 1
    n00, n01 = cells[(0, 0)], cells[(0, 1)]
    n10, n11 = cells[(1, 0)], cells[(1, 1)]
    row = events_ab_chi2(spark, SF_SMOKE).collect()[0]
    assert (row.n00, row.n01, row.n10, row.n11) == (n00, n01, n10, n11)
    margins = (n00 + n01) * (n10 + n11) * (n00 + n10) * (n01 + n11)
    if margins:
        det = n00 * n11 - n01 * n10
        chi2 = (n00 + n01 + n10 + n11) * float(det) * float(det) / float(margins)
        assert abs(row.chi2 - chi2) < 1e-5
        assert row.significant_05 == (1 if round(chi2, 6) > 3.841459 else 0)
    else:
        assert row.chi2 is None


def test_cube_merge_equals_rebuild_second_grain(spark):
    """The registered op's oracle pins merge == rebuild at (status,
    priority); re-check the merge identity inside Spark at a DIFFERENT,
    finer grain (status × month) so the invariant isn't an artifact of the
    15-cell grain."""
    orders = load_table(spark, SF_SMOKE, "orders")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def cube(df):
        return df.groupBy(
            F.col("o_orderstatus").alias("st"), month.alias("m")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c"))

    cutoff = "1999-01-01"
    base = cube(orders.filter(F.col("o_orderdate") < cutoff))
    delta = cube(orders.filter(F.col("o_orderdate") >= cutoff))
    zero = F.lit(0).cast("long")
    merged = (
        base.alias("b")
        .join(delta.alias("d"), ["st", "m"], "full_outer")
        .select(
            "st",
            "m",
            (F.coalesce(F.col("b.n"), zero) + F.coalesce(F.col("d.n"), zero)).alias(
                "n"
            ),
            (F.coalesce(F.col("b.c"), zero) + F.coalesce(F.col("d.c"), zero)).alias(
                "c"
            ),
        )
    )
    got = {(r.st, r.m): (r.n, r.c) for r in merged.collect()}
    want = {(r.st, r.m): (r.n, r.c) for r in cube(orders).collect()}
    assert got == want


def test_shapley_efficiency_and_replay(spark):
    """Efficiency axiom: Σ_c φ_c = v(C) − v(∅); and the full closed form
    must match a Python replay of the subset-mass computation."""
    rows = events_attribution_shapley(spark, SF_SMOKE).collect()
    assert {r.channel for r in rows} == {"click", "signup", "view"}

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    first_p: dict = {}
    for r in ev:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    bits = {"click": 1, "signup": 2, "view": 4}
    mask: dict = {u: 0 for u in first_p}
    for r in ev:
        if (
            r.user_id in first_p
            and r.event_type in bits
            and r.ts < first_p[r.user_id]
        ):
            mask[r.user_id] |= bits[r.event_type]
    cnt = [0] * 8
    for m in mask.values():
        cnt[m] += 1
    v = [sum(cnt[m] for m in range(8) if (m & ~s) == 0) for s in range(8)]
    expect = {
        "click": (2 * (v[1] - v[0]) + (v[3] - v[2]) + (v[5] - v[4]) + 2 * (v[7] - v[6]))
        / 6.0,
        "signup": (
            2 * (v[2] - v[0]) + (v[3] - v[1]) + (v[6] - v[4]) + 2 * (v[7] - v[5])
        )
        / 6.0,
        "view": (2 * (v[4] - v[0]) + (v[5] - v[1]) + (v[6] - v[2]) + 2 * (v[7] - v[3]))
        / 6.0,
    }
    for r in rows:
        assert abs(r.shapley - expect[r.channel]) < 1e-5
        assert r.touched_conversions == sum(
            c for m, c in enumerate(cnt) if m & bits[r.channel]
        )
    assert abs(sum(r.shapley for r in rows) - (v[7] - v[0])) < 1e-4
