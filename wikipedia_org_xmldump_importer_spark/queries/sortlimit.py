"""SURVEY.md §2.6 — sort / limit / top-k / sampling (o1-o3).

100 TB notes: global total sorts are range-partitioned (sampled boundaries) —
fine. Global row_number() however is a single-partition window; o1 keeps it
because the judged result must bake the order into values, but at scale the
pattern is rank-within-partition + partition-offset (zipWithIndex shape) or
simply avoid global sequence numbers. Top-k (o2) compiles to
TakeOrderedAndProject: per-partition heap + driver merge, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_O1_ORACLE = """
SELECT ROW_NUMBER() OVER (
         ORDER BY o_orderstatus DESC, o_totalprice DESC, o_orderkey
       ) AS rn,
       o_orderkey, o_orderstatus
FROM orders
"""


@register("sort_multi", oracle=_O1_ORACLE)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort made hash-visible via a global row_number over a total
    order (unique tiebreak: o_orderkey). desc_nulls_last spelling exercises
    the null-ordering API (data is null-free; semantics match DuckDB's
    default NULLS LAST for DESC)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(
        F.col("o_orderstatus").desc_nulls_last(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc_nulls_first(),
    )
    return orders.select(
        F.row_number().over(w).cast("long").alias("rn"), "o_orderkey", "o_orderstatus"
    )


_O2_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("limit_topk", oracle=_O2_ORACLE)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Plan-asserted as TakeOrderedAndProject in tests."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@register("sample_frac", oracle=None)  # sampler RNG differs from DuckDB (SURVEY §2.6 o3)
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible Bernoulli sample (fixed seed). 100 TB: sampling is
    partition-local, no shuffle; the seed+fraction pair makes reruns stable
    on identical partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.sample(fraction=0.1, seed=42).select("c_custkey", "c_nationkey")
