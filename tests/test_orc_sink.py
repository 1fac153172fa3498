"""s15 ORC sink/scan: round-trip equality, predicate pushdown reaching the
ORC scan, and partition pruning (SURVEY §2.1).

ORC is the engine's second Spark-native columnar endpoint (classic
Hive/Presto warehouses consume it); the contract mirrors parquet's: DSv2
pushdown must fire, and a partitioned write must lay out hive dirs.
"""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table, scan_orc, sink_orc
from wikipedia_org_xmldump_importer_spark.plans import executed_plan


def test_orc_round_trip_value_equality(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_orc")
    sink_orc(src, out)
    back = scan_orc(spark, out)
    assert back.schema == src.schema
    a = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).alias("cents"),
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5)).alias("cents"),
    ).collect()[0]
    assert (a.n, a.q, a.cents) == (b.n, b.q, b.cents)


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    out = str(tmp_path / "orders_orc")
    sink_orc(load_table(spark, SF_SMOKE, "orders"), out)
    q = scan_orc(spark, out).filter(F.col("o_totalprice") > 100000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = executed_plan(q)
    # The filter must reach the ORC reader as a pushed predicate (stripe /
    # row-group skipping), and the projection must prune the read schema.
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_comment" not in read_schema, "column pruning must reach the scan"


def test_orc_partitioned_write_prunes(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = tmp_path / "orders_orc_part"
    sink_orc(df, str(out), partition_by=["o_year"])
    years = {p.name for p in out.iterdir() if p.name.startswith("o_year=")}
    assert len(years) > 1, "expected multiple hive partition dirs"
    back = scan_orc(spark, str(out))
    one_year = int(sorted(years)[0].split("=")[1])
    plan = executed_plan(back.filter(F.col("o_year") == one_year))
    # Partition pruning: the scan's PartitionFilters carry the predicate.
    assert "PartitionFilters" in plan and "o_year" in plan
    expected = df.filter(F.col("o_year") == one_year).count()
    assert back.filter(F.col("o_year") == one_year).count() == expected
