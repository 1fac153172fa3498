"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``wikipedia_org_xmldump_importer_spark``; the
operator inventory is SURVEY.md §2 (one registry entry per row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wikipedia_org_xmldump_importer_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by region × year) on /root/testdata/sf0.001."""
    _registry._ensure_loaded()
    return _registry.REGISTRY["flagship_star_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check)."""
    return _registry.all_oracles()
