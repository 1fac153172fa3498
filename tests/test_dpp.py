"""Dynamic partition pruning (SURVEY §4.2): the Catalyst feature that makes
partitioned 100 TB fact tables usable — a selective dimension filter is
turned into a runtime IN-subquery on the fact table's PARTITION column, so
only matching partition directories are scanned at all.

This is the partition-level sibling of predicate pushdown: static pruning
needs the literal in the query; DPP prunes from a JOIN side computed at
runtime. Without it, `fact JOIN dim WHERE dim.selective` scans every fact
partition."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    """Orders written partitioned by priority — the 100 TB layout where
    each partition value is its own directory tree."""
    out = str(tmp_path_factory.mktemp("dpp") / "orders_by_priority")
    load_table(spark, SF_SMOKE, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(out)
    return out


def test_dpp_subquery_injected_and_result_correct(spark, partitioned_orders):
    """Joining the partitioned fact on its partition column against a
    filtered dim must inject a dynamicpruning expression into the fact
    scan, and the pruned result must equal the unpartitioned join."""
    fact = spark.read.parquet(partitioned_orders)
    # "dim" with a selective filter: DPP's planner rule requires a
    # selective predicate on the build side (an unfiltered relation would
    # prune nothing, so Catalyst skips the subquery)
    dim = spark.createDataFrame(
        [("1-URGENT", 10), ("3-MEDIUM", 30), ("2-HIGH", -1), ("4-NOT SPECIFIED", -1)],
        "prio string, weight int",
    ).filter("weight > 0")
    joined = fact.join(dim, fact.o_orderpriority == dim.prio).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"), F.sum("weight").alias("w"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = {r.o_orderpriority: (r.n, r.w) for r in joined.collect()}
    base = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "3-MEDIUM"))
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    want = {r.o_orderpriority: r["count"] for r in base}
    assert set(got) == set(want)
    for k, (n, w) in got.items():
        assert n == want[k]
        assert w == want[k] * {"1-URGENT": 10, "3-MEDIUM": 30}[k]


def test_static_partition_pruning_reads_one_directory(spark, partitioned_orders):
    """The static baseline DPP generalizes: a literal filter on the
    partition column must reach the scan as partition pruning (the scan's
    partition filters, not a post-scan Filter over all rows)."""
    fact = spark.read.parquet(partitioned_orders)
    q = fact.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan or (
        "o_orderpriority) = 5-LOW" in plan and "PartitionFilters" in plan
    ), plan[:2000]
    want = (
        load_table(spark, SF_SMOKE, "orders")
        .filter("o_orderpriority = '5-LOW'")
        .count()
    )
    assert q.count() == want


def test_runtime_bloom_filter_injected(spark):
    """The row-level sibling of DPP (SURVEY §4.2): for a shuffle join with
    a selective build side, Catalyst injects a bloom-filter aggregate on
    the build side and rewrites the probe side scan with might_contain —
    runtime pruning of shuffle input that partition layout can't give.
    Thresholds are lowered because the sandbox tables are far below the
    production 10 GB application-side default; the mechanism is identical."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
        # bloom filtering is advisory (false positives allowed) — results
        # must equal the plain join
        want = (
            li.join(
                load_table(spark, SF_SMOKE, "orders").filter(
                    "o_orderpriority = '1-URGENT'"
                ),
                li.l_orderkey == F.col("o_orderkey"),
            )
            .groupBy("l_returnflag")
            .count()
            .collect()
        )
        got = {r.l_returnflag: r["count"] for r in j.collect()}
        assert got == {r.l_returnflag: r["count"] for r in want}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
