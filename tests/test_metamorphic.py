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
