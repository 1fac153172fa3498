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


_SKYLINE_ORACLE = """
WITH pp AS (
  SELECT p_retailprice AS price, MAX(p_size) AS max_size_here
  FROM part GROUP BY 1
),
r AS (
  SELECT price, max_size_here,
         MAX(max_size_here) OVER (
           ORDER BY price
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper
  FROM pp
)
SELECT p.p_partkey, p.p_name, ROUND(p.p_retailprice, 2) AS price, p.p_size
FROM part p JOIN r ON p.p_retailprice = r.price
WHERE p.p_size = r.max_size_here
  AND (r.best_cheaper IS NULL OR p.p_size > r.best_cheaper)
"""


@register("skyline_pareto_front", oracle=_SKYLINE_ORACLE)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x125: 2-D SKYLINE (Pareto-dominance frontier) over part —
    minimize price, maximize size; a part survives iff no part is both
    cheaper-or-equal AND bigger-or-equal with one strict. The naive
    spelling is a dominance self-join (n² — banned); the scalable form
    collapses to the price GRID first (max size per distinct price), runs
    ONE running-max window over the grid (strictly-cheaper frame = ROWS
    … 1 PRECEDING, each price appears once), and joins the tiny frontier
    verdict back to parts. Survival = size equals its price's max AND
    strictly beats the best strictly-cheaper size.

    Distinct from pareto_abc (x98: cumulative-share CLASSING — a 1-D
    ranking); this is multi-objective DOMINANCE — the skyline operator of
    Börzsönyi et al. (ICDE 2001), standard in DB engines as SKYLINE OF.

    100 TB: one groupBy on price + a window over the |distinct prices|
    grid (if the grid itself is huge, bin prices first — x116's two-level
    device applies verbatim) + one hash join back. Float price as join
    key is safe: both sides carry identical parquet doubles, no
    arithmetic before the comparison."""
    part = load_table(spark, sf_dir, "part")
    pp = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("max_size_here")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    r = pp.withColumn("best_cheaper", F.max("max_size_here").over(w))
    joined = part.join(F.broadcast(r), part.p_retailprice == r.price)
    return joined.filter(
        (F.col("p_size") == F.col("max_size_here"))
        & (
            F.col("best_cheaper").isNull()
            | (F.col("p_size") > F.col("best_cheaper"))
        )
    ).select(
        "p_partkey",
        "p_name",
        F.round("p_retailprice", 2).alias("price"),
        "p_size",
    )
