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


def test_containment_bounds_and_superset_of_threshold(spark):
    """Directed containments in (0,1]; every kept pair crosses τ in at
    least one direction."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        _CONT_TAU,
        dedup_containment,
    )

    pdf = dedup_containment(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    for c in ("cont_a_in_b", "cont_b_in_a"):
        assert ((pdf[c] > 0) & (pdf[c] <= 1.0)).all()
    assert ((pdf["cont_a_in_b"] >= _CONT_TAU) | (pdf["cont_b_in_a"] >= _CONT_TAU)).all()


def test_oov_rate_bounds_and_token_conservation(spark):
    """OOV rate in [0,1]; n_oov <= n_tokens; every doc present."""
    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.queries.textops import vocab_oov_rate

    pdf = vocab_oov_rate(spark, SF_SMOKE).toPandas()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(pdf) == n_docs
    assert ((pdf["oov_rate"] >= 0) & (pdf["oov_rate"] <= 1)).all()
    assert (pdf["n_oov"] <= pdf["n_tokens"]).all()


def test_entropy_and_kl_nonnegative(spark):
    """Shannon entropy >= 0; KL >= 0 (Gibbs), modulo the micro-unit
    fixed-point grain."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        source_lang_entropy,
    )

    pdf = source_lang_entropy(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["lang_entropy_bits"] >= -1e-6).all()
    assert (pdf["kl_to_corpus_bits"] >= -1e-4).all()


def test_rolling_corr_in_unit_interval(spark):
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        ts_rolling_corr,
    )

    pdf = ts_rolling_corr(spark, SF_SMOKE).toPandas()
    vals = pdf["rolling_corr"].dropna()
    assert len(vals) > 0
    assert ((vals >= -1.0 - 1e-9) & (vals <= 1.0 + 1e-9)).all()


def test_user_overlap_inclusion_exclusion(spark):
    """n_both <= min(n_a, n_b); jaccard in (0, 1]."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_user_overlap,
    )

    pdf = events_user_overlap(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_both"] <= pdf[["n_a", "n_b"]].min(axis=1)).all()
    assert ((pdf["audience_jaccard"] > 0) & (pdf["audience_jaccard"] <= 1)).all()


def test_null_safe_join_keeps_null_group(spark):
    """The whole point: the NULL-keyed group must be IN the output."""
    from wikipedia_org_xmldump_importer_spark.queries.joins import join_null_safe

    pdf = join_null_safe(spark, SF_SMOKE).toPandas()
    assert "NULL" in set(pdf["status"])
    assert (pdf["n_left"] > 0).all() and (pdf["n_right"] > 0).all()


def test_abc_scalable_agrees_with_exact_on_class_mass(spark):
    """Bin-edge approximation check: the A-class total revenue share must
    be within one bin's width of 50%."""
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
        _ABC_BIN_CENTS,
        pareto_abc_scalable,
    )

    pdf = pareto_abc_scalable(spark, SF_SMOKE).toPandas()
    total = pdf["revenue"].sum()
    a_share = pdf.loc[pdf["abc_class"] == "A", "revenue"].sum() / total
    # class boundary lands on a bin edge; the bin that straddles 50% can
    # swing the A-mass by at most its own share of total
    max_bin_share = (
        pdf.assign(bin=(pdf["revenue"] * 100 // _ABC_BIN_CENTS))
        .groupby("bin")["revenue"]
        .sum()
        .max()
        / total
    )
    assert a_share <= 0.5 + 1e-9
    assert a_share >= 0.5 - max_bin_share - 1e-9


def test_scd2_pit_exactly_one_version_per_qualifying_key(spark):
    from wikipedia_org_xmldump_importer_spark.queries.merge_ops import (
        scd2_point_in_time,
    )

    pdf = scd2_point_in_time(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert not pdf.duplicated("o_custkey").any()


def test_q6_matches_two_filter_decomposition(spark):
    """Q6's single conjunctive filter == intersection of its parts,
    recomputed independently."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.queries.flagship import (
        tpch_q6_forecast,
    )

    got = tpch_q6_forecast(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem").toPandas()
    m = (
        (li["l_shipdate"] >= "1996-01-01")
        & (li["l_shipdate"] < "1997-01-01")
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    sub = li[m]
    assert got["n_lines"] == len(sub)
    assert abs(got["revenue_delta"] - round((sub["l_extendedprice"] * sub["l_discount"]).sum(), 2)) < 0.02


def test_basket_mask_path_matches_explode_fallback(spark):
    """r14: the ≤62-brand mask-histogram path must emit row-for-row the
    same pairs/support/lift as the per-basket explode fallback."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
        _basket_brand_pairs_explode,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    old = (
        _basket_brand_pairs_explode(joined)
        .toPandas()
        .sort_values(["brand_a", "brand_b"])
        .reset_index(drop=True)
    )
    new = (
        basket_brand_pairs(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["brand_a", "brand_b"])
        .reset_index(drop=True)
    )
    assert old.equals(new)
