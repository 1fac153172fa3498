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
