"""SURVEY.md §2.14 — correlated subqueries (x39-x40).

The destination-database query surface the reference delegates to its RDBMS
includes correlated subqueries; on Spark these are the one query class
where the cleanest spelling is SQL over temp views (SURVEY §3.2 entry
point 3) — Catalyst's decorrelation rewrites
(RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) turn them into
the same aggregate + join plans a hand-decorrelated DataFrame version
would build, which is exactly what makes them safe at 100 TB: no
per-row re-execution semantics survive optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

_SCALAR_SQL = """
SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
FROM {cust} c
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM {cust} c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


@register("sub_correlated_scalar", oracle=_SCALAR_SQL.format(cust="customer"))
def sub_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x39: customers above their own nation's average balance — a
    correlated scalar subquery, run through spark.sql so Catalyst's
    decorrelation is what executes (plan-asserted in tests: one aggregate
    on the ~25-row nation grain + one join, NOT a per-row re-query).

    100 TB notes: post-rewrite the subquery side is a partial-agg'd
    groupBy(c_nationkey) — 25 rows — broadcast back onto the fact side;
    the correlated spelling costs nothing over the manual join form."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sub_customer_v"
    )
    return spark.sql(_SCALAR_SQL.format(cust="sub_customer_v"))


_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name
FROM {cust} c
WHERE EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
  )
  AND NOT EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      AND o.o_totalprice < 1000
  )
"""


@register(
    "sub_exists_notexists",
    oracle=_EXISTS_SQL.format(cust="customer", orders="orders"),
)
def sub_exists_notexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x40: conjunction of a correlated EXISTS and a correlated NOT EXISTS
    with extra predicates — Catalyst rewrites to a left-semi join chained
    with a left-anti join (RewritePredicateSubquery). The DataFrame API
    can spell each half separately (join_semi_anti does); the SQL spelling
    is how a reference user would write it, and both predicates push into
    the orders scan before either join.

    100 TB notes: both rewritten joins are equi-joins on o_custkey with
    the selective price filters applied scan-side; no correlated
    re-execution, no BNLJ."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sub_customer_v"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sub_orders_v")
    return spark.sql(_EXISTS_SQL.format(cust="sub_customer_v", orders="sub_orders_v"))


# --------------------------------------------------------------------------
# j11 — LATERAL correlated table subquery (top-k per row without a window)
# --------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS totalprice
FROM {cust} c, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
"""


@register(
    "join_lateral",
    oracle=_LATERAL_SQL.format(cust="customer", orders="orders"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j11: LATERAL correlated table subquery — each customer's top-2
    orders, spelled as the SQL-standard LATERAL join both engines support
    natively. Catalyst decorrelates it into the same
    rank-filtered-window/join shape as w2's top-k (DecorrelateInnerQuery +
    RewriteLateralSubquery), so the per-row-subquery SEMANTICS never
    survive to execution — the safe property at 100 TB.

    100 TB: post-rewrite this is one orders-side shuffle on o_custkey with
    a WindowGroupLimit-capped rank — identical cost to the hand-written
    window form; inner-join semantics drop customers with no orders."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders_v")
    return spark.sql(_LATERAL_SQL.format(cust="lat_customer_v", orders="lat_orders_v"))
