"""SURVEY.md §2.7 — set operations (u1-u3).

100 TB notes: union-all is a zero-shuffle concatenation of partitions;
distinct-union/intersect/except are hash aggregates / hash joins on the full
row — project to the minimal column set *before* the set op so the shuffle
carries only what the semantics need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_U1_ORACLE = """
SELECT 'all' AS mode, nk AS nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey AS nk FROM supplier
)
GROUP BY nk
UNION ALL
SELECT 'distinct' AS mode, nk AS nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION
  SELECT s_nationkey AS nk FROM supplier
)
GROUP BY nk
"""


@register("set_union", oracle=_U1_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    union_all = (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("all").alias("mode"), "nationkey", "n")
    )
    union_distinct = (
        cust.unionByName(supp)
        .distinct()
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("distinct").alias("mode"), "nationkey", "n")
    )
    return union_all.unionByName(union_distinct)


_U2_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
"""


@register("set_intersect", oracle=_U2_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiplicity = min(count_left, count_right)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp)


_U3_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
"""


@register("set_except", oracle=_U3_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity = max(0, count_left - count_right)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.exceptAll(supp)
