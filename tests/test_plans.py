"""Plan-shape assertions (SURVEY §5.4): the *physical* plan, not just the
result, must be the one we designed for 100 TB."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.plans import (
    executed_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema,
    whole_stage_codegen_spans,
)
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _q(spark, name: str):
    return REGISTRY[name].fn(spark, SF_SMOKE)


def test_join_broadcast_is_broadcast(spark):
    df = _q(spark, "join_broadcast")
    assert has_broadcast_hash_join(df)
    assert "SortMergeJoin" not in executed_plan(df)


def test_limit_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in executed_plan(_q(spark, "limit_topk"))


def test_topk_per_group_uses_window_group_limit(spark):
    assert "WindowGroupLimit" in executed_plan(_q(spark, "win_topk_per_group"))


def test_filter_pushdown_reaches_parquet(spark):
    df = load_table(spark, SF_SMOKE, "orders").filter("o_totalprice > 400000").select(
        "o_orderkey"
    )
    pushed = ";".join(pushed_filters(df))
    assert "IsNotNull(o_totalprice)" in pushed
    assert "GreaterThan(o_totalprice" in pushed


def test_column_pruning_reaches_parquet(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    assert read_schema(df) == ["struct<l_orderkey:bigint,l_quantity:double>"]


def test_flagship_broadcasts_dims_once(spark):
    plan = executed_plan(_q(spark, "flagship_star_revenue"))
    # nation and region joins must both be broadcast
    assert plan.count("BroadcastHashJoin") >= 2


def test_whole_stage_codegen_covers_agg(spark):
    # Both the partial and final HashAggregate must sit inside codegen spans.
    assert whole_stage_codegen_spans(_q(spark, "agg_groupby"), materialize=True) >= 2


def test_semi_anti_are_semi_anti(spark):
    plan = executed_plan(_q(spark, "join_semi_anti"))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_ngram_jaccard_is_bucket_emission_no_join(spark):
    # Bucket-emission shape: pairs come from a groupBy(shingle) posting
    # list + bounded double-explode — there must be NO join (the former
    # self-join recomputed the shingle pipeline per branch) and no
    # broadcast of the exploded shingle table (driver bottleneck locally,
    # impossible at 100 TB).
    plan = executed_plan(_q(spark, "dedup_ngram_jaccard"), materialize=True)
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_correlated_scalar_subquery_is_decorrelated(spark):
    """x39 must optimize to an aggregate-on-nation-grain + join — no
    per-row subquery re-execution survives Catalyst's decorrelation."""
    plan = executed_plan(_q(spark, "sub_correlated_scalar"), materialize=True)
    assert "HashAggregate" in plan
    assert "Join" in plan
    assert "Subquery" not in plan, plan


def test_exists_notexists_rewrites_to_semi_anti(spark):
    """x40's EXISTS / NOT EXISTS pair must become a semi + anti join chain
    with the price predicates pushed into the orders scans."""
    plan = executed_plan(_q(spark, "sub_exists_notexists"), materialize=True)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_range_binned_join_has_no_bnlj(spark):
    """j10 must execute the band join as an equi join on the bin key —
    no BroadcastNestedLoopJoin, no per-pair predicate evaluation."""
    plan = executed_plan(_q(spark, "join_range_binned"), materialize=True)
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_q6_pushes_all_three_predicates(spark):
    """x109's whole point: date range, discount band, and quantity cap all
    reach the parquet scan as PushedFilters."""
    pushed = ";".join(pushed_filters(_q(spark, "tpch_q6_forecast")))
    assert "l_shipdate" in pushed
    assert "GreaterThanOrEqual(l_discount" in pushed
    assert "LessThanOrEqual(l_discount" in pushed
    assert "LessThan(l_quantity" in pushed


def test_q18_semi_join_not_row_multiplying(spark):
    """x82's HAVING set applies as a semi join (either a dedicated
    Left-Semi hash join, or AQE's aggregate-based rewrite) — never an
    inner join that multiplies lineitem rows."""
    plan = executed_plan(_q(spark, "tpch_q18_large_orders"))
    assert "LeftSemi" in plan or "Semi" in plan


def test_q7_no_nested_loop_from_disjunction(spark):
    """x80's disjunctive nation-pair predicate must stay a residual over
    broadcast equi-joins — never compile to a BroadcastNestedLoopJoin or
    CartesianProduct."""
    plan = executed_plan(_q(spark, "tpch_q7_nation_volume"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q16_not_in_degrades_to_plain_anti(spark):
    """x88's NOT IN on a provably non-null key must compile to an anti
    join, not a cartesian null-check."""
    plan = executed_plan(_q(spark, "tpch_q16_supplier_variety"))
    assert "LeftAnti" in plan or "Anti" in plan
    assert "CartesianProduct" not in plan
