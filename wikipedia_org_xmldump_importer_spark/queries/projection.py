"""SURVEY.md §2.2 — projection / filter / distinct (p1, p2, p4).

p3 (filter_namespace, the importer's article-only filter) operates on XML
pages and is golden-tested in tests/test_xml_ingest.py, not oracle-checked
(no XML table in the oracle views).

100 TB notes: all three are narrow, shuffle-free (p4 excepted: distinct is a
hash aggregate -> one shuffle on the distinct key set). Filters and column
pruning push to the parquet scan; predicates use only Catalyst expressions so
whole-stage codegen covers the entire operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# boosted_bal rounds at 3 dp, not 2: acctbal is a 2-decimal value, so ×1.1 is
# an EXACT 3-decimal value — rounding at 2 dp sits exactly on the .xx5
# boundary where Spark (shortest-decimal-repr HALF_UP) and DuckDB (binary
# round) systematically disagree. Rounding at the value's own grid is stable.
_P1_ORACLE = """
SELECT
  c_custkey AS custkey,
  c_name AS name,
  ROUND(c_acctbal * 1.1, 3) AS boosted_bal,
  c_mktsegment AS segment
FROM customer
"""


@register("project_rename", oracle=_P1_ORACLE)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 1.1, 3).alias("boosted_bal"),
        F.col("c_mktsegment").alias("segment"),
    )


_P2_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 300000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND (o_orderstatus <> 'P' OR o_orderstatus IS NULL)
  AND o_orderpriority LIKE '%-%'
  AND o_custkey IS NOT NULL
"""


@register("filter_pred", oracle=_P2_ORACLE)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(50000, 300000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ((F.col("o_orderstatus") != "P") | F.col("o_orderstatus").isNull())
        & F.col("o_orderpriority").like("%-%")
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
    )


_P4_ORACLE = "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"


@register("distinct_rows", oracle=_P4_ORACLE)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_nationkey", "c_mktsegment").distinct()


_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, ROUND(l_quantity, 2) AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', ROUND(l_extendedprice, 2) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', ROUND(l_discount, 2) FROM lineitem
"""


@register("reshape_unpivot", oracle=_UNPIVOT_ORACLE)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (the inverse of a7's pivot): melt three measure
    columns into (measure, val) rows via the native unpivot operator.

    100 TB notes: unpivot is a narrow map-side Expand (row count ×
    n_measures, no shuffle) — strictly cheaper than the UNION ALL spelling,
    which would scan the fact table once per measure."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("l_quantity"),
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
        F.round("l_discount", 2).alias("l_discount"),
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
