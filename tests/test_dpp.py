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
