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
from pyspark.sql import functions as F

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


# --------------------------------------------------------------------------
# x171 — NOT IN three-valued-logic semantics (the NULL trap, both ways)
# --------------------------------------------------------------------------

_NOTIN_ORACLE = """
WITH probe AS (
  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
  FROM customer
)
SELECT 'not_in_with_null' AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe)
UNION ALL
SELECT 'not_in_null_filtered',
       CAST(COUNT(*) AS BIGINT)
FROM orders
WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
"""


@register("sub_not_in_nulls", oracle=_NOTIN_ORACLE)
def sub_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x171: NOT IN under THREE-VALUED LOGIC — the classic SQL trap, made
    an explicit contract: when the subquery list contains any NULL,
    `x NOT IN (list)` is never TRUE (x <> NULL is UNKNOWN), so the first
    variant returns ZERO rows no matter the data; filtering the NULLs
    restores the intended anti-join. Both engines implement the standard
    — this row pins that our engine does too (Catalyst compiles the NULL-
    aware variant to a NullAwareAntiJoin, the filtered one to a plain
    left-anti hash join). x40's EXISTS/NOT EXISTS rows are the
    NULL-proof spelling this row argues for.

    100 TB: both variants are anti-joins on the customer-key domain —
    broadcast-size probe side; the null-aware variant degrades to a
    broadcast null-aware join, which is why the filtered spelling is the
    one to ship."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    probe = cust.select(
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("long"))
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )
    orders.createOrReplaceTempView("x171_orders")
    probe.createOrReplaceTempView("x171_probe")
    return orders.sparkSession.sql(
        """
        SELECT 'not_in_with_null' AS variant,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM x171_orders WHERE o_custkey NOT IN (SELECT k FROM x171_probe)
        UNION ALL
        SELECT 'not_in_null_filtered',
               CAST(COUNT(*) AS BIGINT)
        FROM x171_orders
        WHERE o_custkey NOT IN (SELECT k FROM x171_probe WHERE k IS NOT NULL)
        """
    )
