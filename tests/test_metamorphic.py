"""Metamorphic invariants (SURVEY §5.5): relations that must hold between
independently-computed results, no oracle needed."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_filter_join_commutes(spark):
    """filter∘join == join∘filter when the predicate touches one side."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    pred = F.col("o_totalprice") > 200000
    a = orders.join(cust, orders.o_custkey == cust.c_custkey).filter(pred)
    b = orders.filter(pred).join(cust, orders.o_custkey == cust.c_custkey)
    assert a.count() == b.count()
    assert a.agg(F.sum("o_totalprice")).collect()[0][0] == \
           b.agg(F.sum("o_totalprice")).collect()[0][0]


def test_rollup_grand_total_matches_global_agg(spark):
    """The rollup's NULL,NULL row must equal the global aggregate."""
    rolled = REGISTRY["agg_rollup_cube"].fn(spark, SF_SMOKE).toPandas()
    grand = rolled[(rolled["mode"] == "rollup") & rolled.k1.isna() & rolled.k2.isna()]
    assert len(grand) == 1
    cust = load_table(spark, SF_SMOKE, "customer")
    total = cust.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]
    assert abs(float(grand.s.iloc[0]) - float(total)) < 1e-6


def test_topk_is_prefix_of_full_sort(spark):
    topk = REGISTRY["limit_topk"].fn(spark, SF_SMOKE).toPandas()
    orders = load_table(spark, SF_SMOKE, "orders")
    full = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey")
        .toPandas()
    )
    assert list(topk.o_orderkey) == list(full.o_orderkey[: len(topk)])


def test_exact_dedup_idempotent(spark):
    """Deduping an already-deduped corpus is the identity."""
    groups = REGISTRY["dedup_exact"].fn(spark, SF_SMOKE)
    n_groups = groups.count()
    # keeper set re-deduped -> same count
    assert groups.select("content_md5").distinct().count() == n_groups


def test_quantize_roundtrip_error_bounded(spark):
    """Dequantized int8 codes must reconstruct each component within half a
    quantization step (scale/254) of the original embedding."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = REGISTRY["vec_quantize_int8"].fn(spark, SF_SMOKE)
    # codes leave the operator serialized (harness schema contract) —
    # re-parse the comma-joined string back to array<int> for the check.
    row = (
        emb.join(q, "vec_id")
        .select(
            (
                F.array_max(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        F.split(F.col("codes"), ",").cast("array<int>"),
                        lambda x, c: F.abs(x - c * F.col("scale") / 127),
                    )
                )
                - F.col("scale") / 254
            ).alias("excess")
        )
        .agg(F.max("excess").alias("worst"))
        .collect()[0]
    )
    assert row.worst <= 1e-6, f"quantization error exceeds half-step by {row.worst}"


def test_hll_sketch_merge_is_lossless(spark):
    """Partition-wise HLL sketches unioned must estimate exactly what the
    single-pass sketch estimates, and land within HLL error of exact."""
    row = REGISTRY["agg_hll_mergeable"].fn(spark, SF_SMOKE).collect()[0]
    assert row.merge_lossless
    exact = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(row.merged_users - exact) / exact < 0.05


def test_price_index_reversal_identity(spark):
    """Index-number theory: Paasche(period order reversed) = 1/Laspeyres,
    so Fisher is direction-symmetric — check both identities by swapping
    the period roles in a hand-built replica of the registered op's
    moments."""
    import datetime

    from wikipedia_org_xmldump_importer_spark.queries.merge_ops import (
        _PRICE_IDX_CUTOFF,
    )

    cutoff = datetime.datetime.fromisoformat(_PRICE_IDX_CUTOFF)
    parts: dict = {}
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
        .collect()
    ):
        c1, q1, c2, q2 = parts.get(r.l_partkey, (0, 0, 0, 0))
        c, q = round(r.l_extendedprice * 100), round(r.l_quantity * 100)
        if r.l_shipdate < cutoff:
            c1, q1 = c1 + c, q1 + q
        else:
            c2, q2 = c2 + c, q2 + q
        parts[r.l_partkey] = (c1, q1, c2, q2)
    m = [v for v in parts.values() if v[1] > 0 and v[3] > 0]

    def lasp(fwd: bool) -> float:
        if fwd:
            return sum(c2 * q1 / q2 for c1, q1, c2, q2 in m) / sum(
                v[0] for v in m
            )
        return sum(c1 * q2 / q1 for c1, q1, c2, q2 in m) / sum(v[2] for v in m)

    def paas(fwd: bool) -> float:
        if fwd:
            return sum(v[2] for v in m) / sum(
                c1 * q2 / q1 for c1, q1, c2, q2 in m
            )
        return sum(v[0] for v in m) / sum(c2 * q1 / q2 for c1, q1, c2, q2 in m)

    assert abs(paas(False) * lasp(True) - 1.0) < 1e-9
    assert abs(paas(True) * lasp(False) - 1.0) < 1e-9


def test_chi2_invariant_under_arm_relabel(spark):
    """Pearson chi² on a 2×2 table is symmetric in the arms: relabeling
    variant 0<->1 must leave the statistic unchanged (det changes sign,
    det² doesn't)."""
    row = REGISTRY["events_ab_chi2"].fn(spark, SF_SMOKE).collect()[0]
    n00, n01, n10, n11 = row.n00, row.n01, row.n10, row.n11
    n = n00 + n01 + n10 + n11

    def chi2(a, b, c, d):
        det = a * d - b * c
        return n * float(det) * float(det) / (
            (a + b) * (c + d) * (a + c) * (b + d)
        )

    assert abs(chi2(n00, n01, n10, n11) - chi2(n10, n11, n00, n01)) < 1e-9
    assert abs(row.chi2 - chi2(n00, n01, n10, n11)) < 1e-5


def test_decompose_seasonal_weighted_sum_is_detrended_total(spark):
    """Construction identity: each weekday's seasonal component is the
    MEAN detrended value over that weekday's valid frames, so the
    day-count-weighted sum of the seven components must equal the total
    detrended mass Σ(revenue − trend) over the emitted days (they are
    NOT zero-sum — boundary exclusion breaks that symmetry)."""
    import datetime

    rows = REGISTRY["ts_decompose_ma"].fn(spark, SF_SMOKE).toPandas()
    wd = rows["day"].map(
        lambda d: datetime.date.fromisoformat(d).strftime("%a")
    )
    per = rows.assign(wd=wd).groupby("wd")["seasonal"].first()
    counts = rows.assign(wd=wd).groupby("wd").size()
    weighted = float((per * counts).sum())
    detrended_total = float((rows["revenue"] - rows["trend"]).sum())
    assert abs(weighted - detrended_total) < 1e-2 * max(1, len(rows))


def test_variance_ratio_is_scale_invariant(spark, tmp_path):
    """x344: VR is a ratio of variances of the SAME series' differences —
    scaling every value by a constant must leave vr (and the momentum
    verdict) unchanged. Scale-invariance catches any accidental
    absolute-magnitude dependence (e.g. a threshold leaking in)."""
    base = REGISTRY["ts_variance_ratio"].fn(spark, SF_SMOKE).toPandas()
    scaled_dir = str(tmp_path / "scaled")
    import os
    os.makedirs(scaled_dir)
    ev = load_table(spark, SF_SMOKE, "events")
    # 10x every value; keep schema/colnames identical
    ev.withColumn("value", F.col("value") * 10).write.parquet(
        f"{scaled_dir}/events.parquet"
    )
    scaled = REGISTRY["ts_variance_ratio"].fn(spark, scaled_dir).toPandas()
    b = base.sort_values("event_type").reset_index(drop=True)
    s = scaled.sort_values("event_type").reset_index(drop=True)
    assert list(b.event_type) == list(s.event_type)
    # vr pinned at 6dp: identical up to the last rounded digit
    assert (abs(b.vr - s.vr) <= 2e-6).all()
    assert list(b.momentum) == list(s.momentum)


def test_kpss_and_seasonal_strength_scale_invariant(spark):
    """x359/x362 are variance RATIOS of the daily-count series — both are
    invariant under any relabeling that preserves counts; here we check
    the cheap internal consistency instead: eta and strength lie in
    their defined ranges on real data (eta > 0; strength <= 1 — SSW
    never exceeds SST by the ANOVA identity)."""
    kpss = REGISTRY["ts_kpss_lite"].fn(spark, SF_SMOKE).toPandas()
    assert (kpss.kpss_eta > 0).all()
    seas = REGISTRY["ts_seasonal_strength"].fn(spark, SF_SMOKE).toPandas()
    assert (seas.seasonal_strength <= 1.0 + 1e-9).all()


def test_turning_points_bounds_and_expected(spark):
    """x345: T is structurally bounded by n-2 interior points, and the
    published expectation must equal 2(n-2)/3 exactly."""
    tp = REGISTRY["ts_turning_points"].fn(spark, SF_SMOKE).toPandas()
    assert (tp.turning_points <= tp.n_days - 2).all()
    # expected_tp is published at 6dp, so compare at that grid
    assert (abs(tp.expected_tp - 2.0 * (tp.n_days - 2) / 3.0) <= 5e-7).all()


def test_modularity_contributions_sum_in_range(spark):
    """x347: Newman modularity Q = sum of per-community contributions lies
    in [-0.5, 1) for any partition of any graph."""
    q = REGISTRY["graph_modularity_nation"].fn(spark, SF_SMOKE).toPandas()
    total = q.q_contrib.sum()
    assert -0.5 - 1e-9 <= total < 1.0
    # degree sums must account for every directed edge
    from wikipedia_org_xmldump_importer_spark.io import load_table as _lt
    orders = _lt(spark, SF_SMOKE, "orders")
    li = _lt(spark, SF_SMOKE, "lineitem")
    eb = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    assert int(q.degree_sum.sum()) == 2 * eb.count()


def test_rich_club_phi_is_monotone_bounded(spark):
    """x348: phi(k) is a density in [0, 1]; the rich-node count must
    never grow as the threshold k grows (two rungs can share a count when
    no node's degree falls between them)."""
    rc = (
        REGISTRY["graph_rich_club"].fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("k")
    )
    assert ((rc.phi >= 0) & (rc.phi <= 1)).all()
    assert (rc.n_rich.diff().dropna() <= 0).all()


def test_epoch_allocator_conserves_budget(spark):
    """x352: floor-division targets must sum to <= budget and cover it to
    within |sources| tokens; epochs == ceil(rate) relation holds."""
    plan = REGISTRY["pipeline_epoch_allocator"].fn(spark, SF_SMOKE).toPandas()
    from wikipedia_org_xmldump_importer_spark.queries.pipeline import (
        _ALLOC_BUDGET,
    )
    assert plan.target_tokens.sum() <= _ALLOC_BUDGET
    assert plan.target_tokens.sum() >= _ALLOC_BUDGET - len(plan)
    # epochs is the integer ceiling of the published rate (6dp display):
    import math
    for _, r in plan.iterrows():
        assert r.epochs == math.ceil(round(r.sample_rate, 6) - 1e-9) or \
               r.epochs == math.ceil(r.sample_rate)


def test_qte_deciles_are_monotone_per_group(spark):
    """x357: rank-discrete quantiles must be non-decreasing in the decile
    for BOTH groups (a violated monotonicity means the rank join picked
    the wrong row)."""
    q = (
        REGISTRY["events_qte_deciles"].fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("decile")
    )
    assert (q.q_treat_cents.diff().dropna() >= 0).all()
    assert (q.q_ctrl_cents.diff().dropna() >= 0).all()


def test_burst_episode_accounting(spark):
    """x363: bursty hours == sum of episode lengths >= longest episode;
    a type with zero episodes reports all-zero burst columns."""
    b = REGISTRY["events_burst_episodes"].fn(spark, SF_SMOKE).toPandas()
    assert (b.n_bursty_hours >= b.longest_episode).all()
    zero = b[b.n_episodes == 0]
    assert (zero.n_bursty_hours == 0).all() and (zero.longest_episode == 0).all()


def test_matched_budget_ttr_budget_respected(spark):
    """x364: the prefix rule admits a doc only if the budget wasn't already
    met, so tokens used are >= budget (crossing doc included) unless the
    source is smaller than the budget, and never exceed budget + the
    largest admitted doc."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        _MTTR_BUDGET,
    )
    t = REGISTRY["text_ttr_matched_budget"].fn(spark, SF_SMOKE).toPandas()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", F.size(F.split("text", " ")).alias("ntok")
    )
    supply = {
        r["source"]: (r["s"], r["m"])
        for r in docs.groupBy("source")
        .agg(F.sum("ntok").alias("s"), F.max("ntok").alias("m"))
        .collect()
    }
    for _, r in t.iterrows():
        total, biggest = supply[r.source]
        if total >= _MTTR_BUDGET:
            assert _MTTR_BUDGET <= r.n_tokens <= _MTTR_BUDGET + biggest
        else:
            assert r.n_tokens == total
