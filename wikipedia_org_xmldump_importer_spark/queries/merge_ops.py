"""SURVEY.md §2 rows x49 (merge_scd1) and x50 (scd2_history).

The reference class's "truncate-or-upsert" load semantics (SURVEY §1.2 [K])
re-expressed as distributed plans: an SCD1 upsert merge and an SCD2
valid-range history — the two canonical ways an importer reconciles a new
dump against an existing snapshot. Kernels live in operators/merge.py; this
module binds them to the driver tables with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.merge import merge_upsert, scd2_snapshot
from ..registry import register

# --------------------------------------------------------------------------
# x49 — SCD1 upsert merge (deterministic synthetic delta over orders)
# --------------------------------------------------------------------------
# base  = orders with o_orderkey % 7 != 0   (the existing snapshot)
# delta = orders with o_orderkey % 3 == 0, repriced +5% and restatused 'U'
#         (the incoming dump: some rows update the base, the %7==0 ones are
#         brand-new keys → inserts)

_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS total
  FROM orders WHERE o_orderkey % 7 <> 0
),
delta AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         round(round(o_totalprice, 2) * 1.05, 2) AS total
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey,
       COALESCE(d.o_custkey, b.o_custkey) AS o_custkey,
       COALESCE(d.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
       COALESCE(d.total, b.total) AS total,
       CASE WHEN b.o_orderkey IS NULL THEN 'insert'
            WHEN d.o_orderkey IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM base b FULL JOIN delta d ON b.o_orderkey = d.o_orderkey
"""


@register("merge_scd1", oracle=_MERGE_ORACLE)
def merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x49: distributed upsert — the importer's truncate-or-upsert load as
    ONE full-outer shuffle join (operators/merge.py merge_upsert).

    100 TB: the base snapshot is the big side; bucket it on the merge key at
    ingest (s7 sink_bucketed) and only the delta (a daily adds-changes dump,
    orders of magnitude smaller) shuffles; AQE broadcasts the delta when it
    fits. The action column gives the audit counts (inserted/updated/kept)
    for free in the same pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap = F.round("o_totalprice", 2)
    base = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", snap.alias("total")
    )
    delta = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(snap * 1.05, 2).alias("total"),
    )
    return merge_upsert(base, delta, keys=["o_orderkey"])


# --------------------------------------------------------------------------
# x50 — SCD2 valid-range history (revision-history shape)
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS version,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_history", oracle=_SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x50: SCD2 versioning of each customer's order stream — the MediaWiki
    revision-history shape (a row is superseded at its successor's
    timestamp) derived in ONE window pass, no self-join
    (operators/merge.py scd2_snapshot).

    100 TB: one shuffle on the partition key; the sort inside each partition
    is the only extra cost over a scan. valid_to via lead() beats the
    join-to-next-version formulation by an entire shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    hist = scd2_snapshot(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        key="o_custkey",
        ts_col="o_orderdate",
        tiebreak="o_orderkey",
    )
    return hist.select(
        "o_custkey",
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )
