"""Unit tests for plans.audit.has_global_window — the structural detector
behind the r9 GlobalWindowExec red-flag class. The detector must fire on a
Window whose subtree's first exchange is SinglePartition, and must NOT fire
on partitioned windows, on windows reusing an upstream hash exchange, or on
plain global aggregates (whose SinglePartition exchange has no Window above
it). Built on real executed plans, not hand-written strings, so the parse
tracks Spark's actual tree rendering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.plans.audit import has_global_window
from wikipedia_org_xmldump_importer_spark.plans.inspect import executed_plan


def _df(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 13).alias("v"),
    )


def test_global_window_fires(spark):
    df = _df(spark)
    out = df.select(F.row_number().over(Window.orderBy("v")).alias("rn"))
    assert has_global_window(executed_plan(out))


def test_partitioned_window_does_not_fire(spark):
    df = _df(spark)
    out = df.select(
        F.row_number().over(Window.partitionBy("k").orderBy("v")).alias("rn")
    )
    assert not has_global_window(executed_plan(out))


def test_global_aggregate_alone_does_not_fire(spark):
    # a global agg's Exchange SinglePartition has no Window above it
    df = _df(spark)
    out = df.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    assert not has_global_window(executed_plan(out))


def test_window_reusing_upstream_hash_exchange_does_not_fire(spark):
    # groupBy(k) then a window partitioned by k: the window's subtree
    # bottoms out in the agg's hashpartitioning exchange, which satisfies
    # the window's distribution — no SinglePartition anywhere near it
    df = _df(spark)
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    out = agg.select(
        "k", F.rank().over(Window.partitionBy("k").orderBy("s")).alias("r")
    )
    assert not has_global_window(executed_plan(out))


def test_global_window_after_groupby_fires(spark):
    # dim-grain pattern: collapse first, THEN rank globally — still a
    # structural hit (it is the WAIVER that declares the frame bounded,
    # not the detector)
    df = _df(spark)
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    out = agg.select(
        "k", F.rank().over(Window.orderBy(F.col("s").desc())).alias("r")
    )
    assert has_global_window(executed_plan(out))


def test_windowgrouplimit_partial_stage_does_not_false_positive(spark):
    # rank<=k filter compiles to Partial WindowGroupLimit BEFORE the hash
    # exchange (map-side pruning) — the partial node's subtree reaches the
    # scan without ANY exchange, and the final node sits above
    # hashpartitioning; neither may fire
    df = _df(spark)
    w = Window.partitionBy("k").orderBy("v", "id")
    out = df.select("k", "v", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 3
    )
    plan = executed_plan(out)
    assert "WindowGroupLimit" in plan
    assert not has_global_window(plan)
