"""Bucketed co-located join (SURVEY §4.2 / task mandate: "co-locate joins
via bucketing"): writing both join sides bucketed by the join key lets the
sort-merge join read pre-partitioned data — NO Exchange in the plan, the
shuffle is paid once at write time instead of per query."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.plans import executed_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is a static conf — use explicit per-table external paths
    from wikipedia_org_xmldump_importer_spark.io import sink_bucketed

    wh = tmp_path_factory.mktemp("warehouse")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        sink_bucketed(
            load_table(spark, SF_SMOKE, name),
            f"b_{name}",
            [key],
            n_buckets=8,
            sort_cols=[key],
            path=str(wh / f"b_{name}"),
        )
    yield
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li = spark.table("b_lineitem")
    orders = spark.table("b_orders")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("l_orderkey", "l_quantity", "o_totalprice")
    # Disable broadcast so the co-located SMJ path is what gets planned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .collect()[0]
    )
    b = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .collect()[0]
    )
    assert plain.n == b.n
    assert plain.s == b.s
