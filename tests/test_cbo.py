"""CBO follow-through (SURVEY §4.2): catalog stats + join reordering.

The claim under test is end-to-end: ANALYZE puts rowCount/column stats in
the catalog, load_table resolves to the stats-bearing tables, and Catalyst's
cost-based join reorder actually CHANGES the tpch_q5 6-way join order —
folding the small dimensions together before the fact table — while the
result stays identical to the path-read plan.
"""

from __future__ import annotations

import re

import pytest
from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.cbo import (
    drop_tables,
    register_tables_with_stats,
    registered_dir,
)
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _relation_order(plan: str) -> list[str]:
    """Leaf tables in plan-print order = join-tree order, deepest-first."""
    names = re.findall(r"Relation (?:spark_catalog\.default\.)?(\w+)\[", plan)
    seen: list[str] = []
    for n in names:
        if n not in seen:
            seen.append(n)
    return seen


@pytest.fixture()
def cbo_tables(spark):
    register_tables_with_stats(spark, SF_SMOKE)
    try:
        yield
    finally:
        # shared session fixture: return it to path-based reads + RBO so no
        # other test module sees catalog tables or cbo confs.
        drop_tables(spark)
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


def test_analyze_records_row_and_column_stats(spark, cbo_tables):
    stats = spark.sql("DESC EXTENDED lineitem").filter("col_name='Statistics'")
    txt = stats.collect()[0].data_type
    assert re.search(r"\d+ rows", txt), txt
    # column-level stats: NDV recorded for a join key
    col = spark.sql("DESC EXTENDED lineitem l_orderkey").collect()
    info = {r.info_name: r.info_value for r in col}
    assert info.get("distinct_count") not in (None, "NULL"), info


def test_load_table_resolves_to_catalog_only_when_registered(spark, cbo_tables):
    from wikipedia_org_xmldump_importer_spark.io import load_table

    assert registered_dir(spark, "orders") == SF_SMOKE
    cat_plan = _optimized(load_table(spark, SF_SMOKE, "orders"))
    assert "spark_catalog.default.orders" in cat_plan
    # a DIFFERENT sf_dir must fall back to the path read (stats would lie)
    other = _optimized(load_table(spark, "/root/testdata/sf0.01", "orders"))
    assert "spark_catalog.default.orders" not in other


def test_cbo_reorders_tpch_q5_star_join(spark, cbo_tables):
    q5 = REGISTRY["tpch_q5_local_volume"].fn

    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    rbo_order = _relation_order(_optimized(q5(spark, SF_SMOKE)))
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    cbo_order = _relation_order(_optimized(q5(spark, SF_SMOKE)))

    # Written order leads with the fact table; the cost-based order must
    # differ and must NOT start by joining the two biggest relations.
    assert rbo_order[0] == "lineitem"
    assert cbo_order != rbo_order
    assert cbo_order[0] != "lineitem"
    # Same rows either way: reordering is a physical decision, not semantic.
    a = sorted(map(tuple, q5(spark, SF_SMOKE).collect()))
    drop_tables(spark)
    b = sorted(map(tuple, q5(spark, SF_SMOKE).collect()))
    assert a == b
