"""Round-6 operator invariants — the structural properties the DuckDB hash
oracle can't express: monotonicity, conservation, bound containment,
exactly-one-winner guarantees. All at sf0.001 (smoke grain)."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
    agg_percentile_disc,
    agg_weighted_percentile,
    basket_brand_pairs,
    pareto_abc,
)
from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
    graph_triangle_count,
)
from wikipedia_org_xmldump_importer_spark.queries.joins import join_asof_nearest
from wikipedia_org_xmldump_importer_spark.queries.textops import (
    agg_mode_exact,
    dedup_keep_best,
    dedup_minhash_det,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    events_inter_arrival,
    orders_open_backlog,
    ts_ema_trailing,
    ts_interpolate_linear,
)


def test_pareto_cumulative_share_monotone_and_complete(spark):
    """cum_share is nondecreasing along the ranked order and ends at 1;
    ABC classes agree with their own thresholds."""
    pdf = pareto_abc(spark, SF_SMOKE).toPandas().sort_values(
        ["revenue", "nation"], ascending=[False, True]
    )
    cs = pdf["cum_share"].to_numpy()
    assert (cs[1:] >= cs[:-1]).all()
    assert abs(cs[-1] - 1.0) < 1e-6
    for _, r in pdf.iterrows():
        expected = "A" if r.cum_share <= 0.5 else ("B" if r.cum_share <= 0.8 else "C")
        assert r.abc_class == expected


def test_weighted_median_is_a_crossing_point(spark):
    """Brute-force re-check: the reported value is the smallest v whose
    cumulative cent-weight reaches half the group total."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table

    got = {
        r.flag: r.weighted_median
        for r in agg_weighted_percentile(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("v"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    pdf = li.toPandas()
    for flag, g in pdf.groupby("flag"):
        g = g.sort_values("v")
        cw = g["w"].cumsum()
        expect = g.loc[2 * cw >= g["w"].sum(), "v"].iloc[0]
        assert got[flag] == expect, (flag, got[flag], expect)


def test_basket_support_lift_bounds(spark):
    """support in (0, 1]; n_ab at least the min-support cut; lift positive;
    pair key is ordered."""
    pdf = basket_brand_pairs(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert ((pdf["support"] > 0) & (pdf["support"] <= 1)).all()
    assert (pdf["n_ab"] >= 20).all()
    assert (pdf["lift"] > 0).all()
    assert (pdf["brand_a"] < pdf["brand_b"]).all()


def test_triangle_counts_divisible_by_three(spark):
    """Every triangle contributes exactly 3 corner rows, so the grand total
    is divisible by 3 and every count is positive."""
    pdf = graph_triangle_count(spark, SF_SMOKE).toPandas()
    assert (pdf["tri_cnt"] > 0).all()
    assert int(pdf["tri_cnt"].sum()) % 3 == 0


def test_minhash_estimates_bounded_and_pairs_ordered(spark):
    pdf = dedup_minhash_det(spark, SF_SMOKE).toPandas()
    assert ((pdf["est_jaccard"] >= 0.5) & (pdf["est_jaccard"] <= 1.0)).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()
    assert not pdf.duplicated(["doc_a", "doc_b"]).any()


def test_keep_best_exactly_one_keep_per_cluster(spark):
    pdf = dedup_keep_best(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    for key, g in pdf.groupby("content_key"):
        assert (g["decision"] == "keep").sum() == 1, key
        assert len(g) == g["cluster_size"].iloc[0]


def test_mode_beats_every_other_lang(spark):
    """The modal lang's count is >= every other lang's count in its source
    (recomputed independently)."""
    from wikipedia_org_xmldump_importer_spark.io import load_table

    got = {r.source: (r.modal_lang, r.n_docs) for r in agg_mode_exact(spark, SF_SMOKE).collect()}
    pdf = load_table(spark, SF_SMOKE, "documents").toPandas()
    counts = pdf.groupby(["source", "lang"]).size()
    for source, (lang, n) in got.items():
        per_lang = counts[source]
        assert n == per_lang.max()
        assert per_lang[lang] == n


def test_inter_arrival_gap_counts(spark):
    """n_gaps per user == that user's event count - 1; min <= median <= max."""
    from wikipedia_org_xmldump_importer_spark.io import load_table

    pdf = events_inter_arrival(spark, SF_SMOKE).toPandas()
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    ev_counts = ev.groupby("user_id").size()
    for _, r in pdf.iterrows():
        assert r.n_gaps == ev_counts[r.user_id] - 1
    assert (pdf["min_gap_us"] <= pdf["median_gap_us"]).all()
    assert (pdf["median_gap_us"] <= pdf["max_gap_us"]).all()


def test_backlog_starts_positive_ends_zero(spark):
    """The sweep opens with the first order (+1) and, past the last close,
    every order has both its +1 and -1 in the prefix — backlog 0."""
    pdf = orders_open_backlog(spark, SF_SMOKE).toPandas().sort_values("day")
    assert pdf["open_orders"].iloc[0] > 0
    assert pdf["open_orders"].iloc[-1] == 0
    assert (pdf["open_orders"] >= 0).all()


def test_interpolation_between_neighbors(spark):
    """Every lerp'd value lies within [min(prev,next), max(prev,next)] —
    re-derived from the observed rows around it."""
    pdf = (
        ts_interpolate_linear(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hour"])
    )
    for _, g in pdf.groupby("event_type"):
        vals = g["value"].to_numpy()
        methods = g["method"].to_numpy()
        obs_idx = [i for i, m in enumerate(methods) if m == "obs"]
        import bisect

        for i, m in enumerate(methods):
            if m != "lerp":
                continue
            j = bisect.bisect_left(obs_idx, i)
            lo_v = vals[obs_idx[j - 1]]
            hi_v = vals[obs_idx[j]]
            assert min(lo_v, hi_v) - 1e-9 <= vals[i] <= max(lo_v, hi_v) + 1e-9


def test_ema_head_normalization(spark):
    """The first bucket of each series has exactly 1 contributing term and
    its EMA equals its own hourly average."""
    pdf = (
        ts_ema_trailing(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hour"])
    )
    for _, g in pdf.groupby("event_type"):
        assert g["n_terms"].iloc[0] == 1
        assert (g["n_terms"] <= 12).all()


def test_nearest_direction_is_actually_nearest(spark):
    """Wherever both neighbors exist the reported side has the smaller (or
    tie-equal) gap — reconstructed from the per-user purchase timeline."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table

    pdf = join_asof_nearest(spark, SF_SMOKE).toPandas()
    assert set(pdf["direction"]) <= {"prev", "next", "none"}
    purchases = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .toPandas()
    )
    by_user = {u: sorted(g["ts"]) for u, g in purchases.groupby("user_id")}
    sample = pdf[pdf["direction"] != "none"].head(200)
    for _, r in sample.iterrows():
        times = by_user[r.user_id]
        best = min(abs((t - r.ts).total_seconds()) for t in times)
        got = abs((r.nearest_purchase_ts - r.ts).total_seconds())
        assert got == best, (r.user_id, got, best)


def test_percentile_disc_values_exist_in_group(spark):
    """Discrete percentiles return actual data values, ordered p25<=p50<=p90."""
    from wikipedia_org_xmldump_importer_spark.io import load_table

    pdf = agg_percentile_disc(spark, SF_SMOKE).toPandas()
    orders = load_table(spark, SF_SMOKE, "orders").toPandas()
    for _, r in pdf.iterrows():
        vals = set(
            round(v, 2)
            for v in orders.loc[orders["o_orderpriority"] == r.priority, "o_totalprice"]
        )
        assert r.p25 <= r.p50 <= r.p90
        assert {r.p25, r.p50, r.p90} <= vals
