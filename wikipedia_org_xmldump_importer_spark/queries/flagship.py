"""Flagship star query: revenue by region × order-year (SURVEY.md §3.2 #1).

Exercises scan + multi-way join + broadcast + aggregation + projection in one
plan — the canonical shape of the destination-DB analytics the reference
delegates to its RDBMS (SURVEY.md §1.2).

100 TB notes: lineitem⋈orders is the only large-large join — it shuffles on
orderkey (both sides co-partitionable / bucketable on the FK). customer is
mid-size (shuffle join, AQE may convert to broadcast at small SF); nation and
region are tiny dims — explicitly broadcast so the region/nation lookup never
shuffles the fact table again. Aggregation is partial+final (map-side combine)
on a 5×7-ish group domain, so the final shuffle is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_ORACLE = """
SELECT
  r.r_name AS region_name,
  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
"""


@register("flagship_star_revenue", oracle=_ORACLE, tags=("flagship", "a2", "j1", "j2"))
def flagship_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
