"""SURVEY.md §2.1 — scans (s1). s2/s3 (XML/CSV) live in sources/ with golden
tests; s4/s5 sinks live in io.py; s6 streaming source in streaming/.

100 TB notes: a bare parquet scan is where pushdown happens — any filter or
projection added downstream reaches the row-group level via DSv2 (asserted in
tests/test_plans.py). The region table is 5 rows; the scan exists as the
driver's flagship smoke of table registration, not as a perf path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


@register("scan_parquet", oracle="SELECT r_regionkey, r_name FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
