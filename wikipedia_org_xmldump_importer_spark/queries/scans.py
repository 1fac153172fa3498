"""SURVEY.md §2.1 — scans (s1). s2/s3 (XML/CSV) live in sources/ with golden
tests; s4/s5 sinks live in io.py; s6 streaming source in streaming/.

100 TB notes: a bare parquet scan is where pushdown happens — any filter or
projection added downstream reaches the row-group level via DSv2 (asserted in
tests/test_plans.py). The region table is 5 rows; the scan exists as the
driver's flagship smoke of table registration, not as a perf path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register("scan_parquet", oracle="SELECT r_regionkey, r_name FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


# --------------------------------------------------------------------------
# x119 — Z-order clustering key by bit interleave
# --------------------------------------------------------------------------

_Z_BITS = 10  # 10 bits per dimension -> 20-bit z-value

_ZORDER_ORACLE = f"""
WITH dims AS (
  SELECT o_orderkey,
         CAST(o_custkey % {1 << _Z_BITS} AS BIGINT) AS a,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
              % {1 << _Z_BITS} AS BIGINT) AS b
  FROM orders
)
SELECT o_orderkey, a, b,
       CAST((SELECT SUM(((a >> i.i) & 1) * power(2, 2 * i.i)
                  + ((b >> i.i) & 1) * power(2, 2 * i.i + 1))
             FROM (SELECT unnest(generate_series(0, {_Z_BITS - 1})) AS i) i)
            AS BIGINT) AS z
FROM dims
"""


@register("zorder_key", oracle=_ZORDER_ORACLE)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x119: Z-ORDER clustering key — the bit-interleave of two bounded
    dimensions (customer bucket × day bucket) into one space-filling-curve
    value. Sorting/range-partitioning the lake by z co-locates rows that
    are close in BOTH dimensions, so 2-D predicates (this customer range
    AND this date range) prune to a contiguous z-range of files — the
    standard multi-dimensional layout technique (Delta/Iceberg OPTIMIZE
    ZORDER) expressed as a pure Catalyst projection.

    Pure integer bit arithmetic (shift/mask/scaled add) — bit-exact on
    any engine; the oracle's power(2,k) terms are exact doubles for
    k < 53 summed over disjoint bits, so the CAST is exact too.

    100 TB: zero shuffle — a projection computed at write time; pair
    with sink_bucketed/sortWithinPartitions(z) to realize the layout.
    The modulo bucketing keeps both dimensions in {_Z_BITS} bits; a
    production pipeline derives bucket widths from min/max stats."""
    orders = load_table(spark, sf_dir, "orders")
    mask = (1 << _Z_BITS) - 1
    a = (F.col("o_custkey") % (1 << _Z_BITS)).cast("long")
    b = (
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        )
        % (1 << _Z_BITS)
    ).cast("long")
    dims = orders.select("o_orderkey", a.alias("a"), b.alias("b"))
    z = None
    for i in range(_Z_BITS):
        term = (F.shiftright(F.col("a"), i).bitwiseAND(1) * (1 << (2 * i))) + (
            F.shiftright(F.col("b"), i).bitwiseAND(1) * (1 << (2 * i + 1))
        )
        z = term if z is None else z + term
    return dims.select("o_orderkey", "a", "b", z.cast("long").alias("z"))
