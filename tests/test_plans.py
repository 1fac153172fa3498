"""Plan-shape assertions (SURVEY §5.4): the *physical* plan, not just the
result, must be the one we designed for 100 TB."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(spark, name: str) -> str:
    return (
        REGISTRY[name]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_join_broadcast_is_broadcast(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_limit_topk_is_take_ordered(spark):
    plan = _plan(spark, "limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_uses_window_group_limit(spark):
    plan = _plan(spark, "win_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_filter_pushdown_reaches_parquet(spark):
    df = load_table(spark, SF_SMOKE, "orders").filter("o_totalprice > 400000").select(
        "o_orderkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_column_pruning_reaches_parquet(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_flagship_broadcasts_dims_once(spark):
    plan = _plan(spark, "flagship_star_revenue")
    # nation and region joins must both be broadcast
    assert plan.count("BroadcastHashJoin") >= 2


def test_whole_stage_codegen_covers_agg(spark):
    # Pre-execution AQE plans hide codegen spans behind AdaptiveSparkPlan;
    # materialize first so the final plan (with WholeStageCodegen ids) exists.
    df = REGISTRY["agg_groupby"].fn(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # In the executed-plan string, whole-stage-codegen spans print as "*(n) "
    # operator prefixes; both partial and final HashAggregate must be inside.
    assert "*(1) HashAggregate" in plan or "WholeStageCodegen" in plan
    assert plan.count("*(") >= 2


def test_semi_anti_are_semi_anti(spark):
    plan = _plan(spark, "join_semi_anti")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
