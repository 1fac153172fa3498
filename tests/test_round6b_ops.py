"""Invariants for the late-round-6 operator batch (x123-x131) — the
structural properties the DuckDB hash oracle can't express: dominance
soundness, streak conservation, fence robustness, coverage monotonicity,
changepoint bounds. All at sf0.001 (smoke grain)."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import Window
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.queries.flagship import tpch_q21_waiting
from wikipedia_org_xmldump_importer_spark.queries.sortlimit import (
    skyline_pareto_front,
)
from wikipedia_org_xmldump_importer_spark.queries.textops import (
    doc_ngram_novelty,
    vocab_coverage_curve,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    events_ab_lift,
    events_active_streaks,
    ts_changepoint_cusum,
    ts_outlier_mad,
    ts_rolling_median,
)


def test_skyline_is_exactly_the_undominated_set(spark):
    """Brute-force dominance re-check at smoke grain: every returned part
    is undominated, and every undominated part is returned."""
    parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    undominated = {
        k
        for k, price, size in parts
        if not any(
            (p2 <= price and s2 >= size and (p2 < price or s2 > size))
            for _, p2, s2 in parts
        )
    }
    got = {r.p_partkey for r in skyline_pareto_front(spark, SF_SMOKE).collect()}
    assert got == undominated


def test_streaks_conserve_active_days_and_bound_longest(spark):
    """Σ streak lengths == distinct active days (conservation); longest ≤
    n_active_days; n_streaks ≥ 1; longest ≤ calendar span."""
    ev = load_table(spark, SF_SMOKE, "events")
    truth = {
        r.user_id: r.n
        for r in ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in events_active_streaks(spark, SF_SMOKE).collect():
        assert r.n_active_days == truth[r.user_id]
        assert 1 <= r.n_streaks <= r.n_active_days
        assert r.longest_streak <= r.n_active_days
        assert r.longest_streak >= (r.n_active_days + r.n_streaks - 1) // r.n_streaks


def test_q21_sole_late_suppliers_verified_per_order(spark):
    """Every counted (supplier) wait has ≥1 order where it is late, the
    order has another supplier, and no other supplier is late on it."""
    ev = tpch_q21_waiting(spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders").filter("o_orderstatus = 'F'")
    late = (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    late_by_order: dict[int, set[int]] = {}
    for r in late:
        late_by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    supp_by_order: dict[int, set[int]] = {}
    for r in li.select("l_orderkey", "l_suppkey").distinct().collect():
        supp_by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    # numwait per supplier == #orders where it's the SOLE late one among many
    expected: dict[int, int] = {}
    for ok, lates in late_by_order.items():
        if len(lates) == 1 and len(supp_by_order[ok]) > 1:
            (s,) = lates
            expected[s] = expected.get(s, 0) + 1
    for r in ev:
        assert expected[r.s_suppkey] == r.numwait


def test_ab_lift_moments_and_z_sign(spark):
    """Arms partition the users; z sign agrees with the mean diff."""
    r = events_ab_lift(spark, SF_SMOKE).collect()[0]
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    if r.z_score is not None and r.diff != 0:
        assert (r.z_score > 0) == (r.diff > 0)


def test_mad_fence_counts_match_bruteforce(spark):
    """Re-derive median/MAD/outliers per type in pandas and compare."""
    import numpy as np

    pdf = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "event_id", "value")
        .toPandas()
    )
    got = {r.event_type: r for r in ts_outlier_mad(spark, SF_SMOKE).collect()}
    for et, g in pdf.groupby("event_type"):
        s = g.sort_values(["value", "event_id"]).value.to_numpy()
        med = s[(len(s) + 1) // 2 - 1]
        adev = np.sort(np.abs(g.value.to_numpy() - med), kind="stable")
        # tie order on equal adevs doesn't matter for the value pick
        mad = adev[(len(adev) + 1) // 2 - 1]
        r = got[et]
        assert r.n == len(g)
        assert abs(r.med - round(med, 6)) < 1e-9
        assert abs(r.mad - round(mad, 6)) < 1e-9
        assert r.n_outliers == int((np.abs(g.value.to_numpy() - med) > 3 * mad).sum())


def test_rolling_median_is_frame_element_and_bounded(spark):
    """Every med5 lies within the frame's [min,max] and IS a frame element
    (odd full frame ⇒ exact pick, never interpolation)."""
    out = ts_rolling_median(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    w = F.collect_list("value").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    )
    frames = ev.select("event_id", w.alias("frame"))
    joined = out.join(frames, "event_id").collect()
    assert joined
    for r in joined:
        assert len(r.frame) == 5
        assert any(abs(round(v, 6) - r.med5) < 1e-9 for v in r.frame)
        assert min(r.frame) <= r.med5 <= max(r.frame) + 1e-9


def test_coverage_curve_monotone_in_pct(spark):
    """Higher coverage targets need (weakly) more vocabulary; 99% needs at
    most the whole vocab."""
    rows = {r.pct: r.k_tokens for r in vocab_coverage_curve(spark, SF_SMOKE).collect()}
    assert rows[50] <= rows[90] <= rows[95] <= rows[99]
    n_vocab = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert rows[99] <= n_vocab


def test_cusum_changepoint_in_range_and_max_is_max(spark):
    """cp_index ∈ [1, n_hours); the reported deviation equals the true
    integer max re-derived from the hourly series."""
    got = {r.event_type: r for r in ts_changepoint_cusum(spark, SF_SMOKE).collect()}
    h = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("x"))
        .toPandas()
    )
    for et, g in h.groupby("event_type"):
        xs = g.sort_values("hr").x.to_list()
        n, sx = len(xs), sum(xs)
        cum, best = 0, 0
        for k in range(1, n):
            cum += xs[k - 1]
            best = max(best, abs(n * cum - k * sx))
        r = got[et]
        assert 1 <= r.cp_index < r.n_hours == n
        assert r.scaled_max_dev == best


def test_novelty_first_doc_is_fully_novel_and_rates_bounded(spark):
    """The smallest doc_id has novelty 1.0; every rate ∈ [0,1]; novel
    grams never exceed distinct grams."""
    rows = doc_ngram_novelty(spark, SF_SMOKE).collect()
    by_id = sorted(rows, key=lambda r: r.doc_id)
    assert by_id[0].novelty_rate == 1.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_distinct_grams
        assert 0.0 <= r.novelty_rate <= 1.0
