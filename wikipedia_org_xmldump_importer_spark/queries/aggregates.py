"""SURVEY.md §2.4 — aggregation a1-a10.

Determinism discipline for the DuckDB hash-oracle (SURVEY §4.3): every
floating-point aggregate is pinned — money sums to 2 dp, averages and
ratios to 6 dp, second-moment stats to 2-4 dp scaled to the statistic's
magnitude (double summation order differs between engines; the residual is
~1e-9 relative, far below the rounding grain). Money/ratio DISPLAYS of
exact-integer moments use flagship's _pin2/_ratio_pin integer-land devices,
not a terminal float round() — see NOTES trap #39 for why round() straddles
on exact display-grid ties.

100 TB notes: all group-bys here are partial+final (map-side combine) with
small group domains, so the final shuffle carries only the group cardinality.
count(distinct) expands to a two-phase aggregate; approx_count_distinct is
the single-pass HLL alternative at scale (a4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .flagship import _avg6_sql, _pin2, _pin2_sql, _ratio_pin

_A1_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  ROUND(SUM(l_extendedprice), 2) AS sum_price,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  MIN(l_shipdate) AS min_ship,
  MAX(l_shipdate) AS max_ship,
  ROUND(MIN(l_quantity), 2) AS min_qty,
  ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
"""


@register("agg_global", oracle=_A1_ORACLE)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


_A2_DISC_U = (
    "SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))"
)
_A2_CHARGE_U = (
    "SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
    " * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))"
)
_A2_ORACLE = ("""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  (SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0) AS sum_base_price,
  {p1} AS sum_disc_price,
  {p2} AS sum_charge,
  {a1} AS avg_qty,
  {a2} AS avg_price,
  {a3} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP \'2000-12-01 00:00:00\'
GROUP BY l_returnflag, l_linestatus
""".format(
    p1=_pin2_sql(_A2_DISC_U, 10000),
    p2=_pin2_sql(_A2_CHARGE_U, 1000000),
    a1=_avg6_sql("CAST(SUM(l_quantity) AS BIGINT)", 1000000),
    a2=_avg6_sql("SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))", 10000),
    a3=_avg6_sql("SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))", 10000),
))


@register("agg_groupby", oracle=_A2_ORACLE)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped multi-measure group-by."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz")
    )
    # r11 straddle-family sweep + the sf1 terminal-ROUND fix: exact
    # integer-unit money sums with the display tie pinned in integer land
    # (flagship._pin2 — a terminal float ROUND disagrees across engines on
    # exact half-cent ties); averages pin floor((2·num·10^6/scale + n)/(2n))
    # in DECIMAL(38) (flagship Q1's avg6 twin of _avg6_sql).
    # floor(x*100+0.5) device — see flagship._money_u for why not round()
    u = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("long")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cents, dpct, tpct = u("l_extendedprice"), u("l_discount"), u("l_tax")
    cnt = F.count(F.lit(1))

    def avg6(num: F.Column, mult: int) -> F.Column:
        t = num.cast("decimal(38,0)") * F.lit(2 * mult) + cnt
        n2 = (cnt * 2).cast("decimal(38,0)")
        q = ((t - F.pmod(t, n2)) / n2).cast("long")
        return q.cast("double") / F.lit(1000000.0)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_base_price"),
        _pin2(F.sum(cents * (100 - dpct)), 10000).alias("sum_disc_price"),
        _pin2(F.sum(dec(cents * (100 - dpct) * (100 + tpct))), 1000000).alias(
            "sum_charge"
        ),
        avg6(F.sum("l_quantity").cast("long"), 1000000).alias("avg_qty"),
        avg6(F.sum(cents), 10000).alias("avg_price"),
        avg6(F.sum(dpct), 10000).alias("avg_disc"),
        cnt.alias("count_order"),
    )


_A3_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS n_supp,
  COUNT(DISTINCT l_partkey) AS n_part,
  ROUND(SUM(DISTINCT l_quantity), 2) AS sum_uq_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_distinct", oracle=_A3_ORACLE)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_uq_qty"),
    )


@register("agg_approx_distinct", oracle=None)  # approximate: rows-only (SURVEY §2.4 a4)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count. 100 TB: single-pass, fixed-size sketch per
    partition, no distinct expansion — THE way to count uniques at scale.
    Accuracy asserted against exact count in tests (rel err < 5%)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


_A5_ORACLE = """
SELECT 'rollup' AS mode, r_name AS k1, n_name AS k2,
       COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS s
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
UNION ALL
SELECT 'cube' AS mode, o_orderstatus AS k1, o_orderpriority AS k2,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_rollup_cube", oracle=_A5_ORACLE)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup(region→nation) + cube(status×priority), union-tagged.
    100 TB: rollup/cube expand via Catalyst Expand (one input pass, k output
    rows per input row) — fine when the grouping-set count is small."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    rolled = (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("s"))
        .select(
            F.lit("rollup").alias("mode"),
            F.col("r_name").alias("k1"),
            F.col("n_name").alias("k2"),
            "n",
            "s",
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cubed = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
        .select(
            F.lit("cube").alias("mode"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "n",
            "s",
        )
    )
    return rolled.unionByName(cubed)


_A6_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_grouping_sets", oracle=_A6_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — spelled in SQL on both engines (SURVEY §3.2
    #3: some operators' cleanest spelling is SQL)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS s
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_A7_ORACLE = """
SELECT
  date_trunc('day', ts) AS day,
  COALESCE(COUNT(*) FILTER (event_type = 'view'), 0) AS n_view,
  COALESCE(COUNT(*) FILTER (event_type = 'click'), 0) AS n_click,
  COALESCE(COUNT(*) FILTER (event_type = 'signup'), 0) AS n_signup,
  COALESCE(COUNT(*) FILTER (event_type = 'purchase'), 0) AS n_purchase,
  COALESCE(COUNT(*) FILTER (event_type = 'error'), 0) AS n_error,
  ROUND(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase_value
FROM events
GROUP BY date_trunc('day', ts)
"""

_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")


@register("agg_filtered_pivot", oracle=_A7_ORACLE)
def agg_filtered_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → per-day count columns + a conditional-sum measure.
    Uses the true pivot API with an explicit value list (no extra distinct
    pass — at 100 TB always pass pivot values explicitly)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    counts = (
        ev.groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    for t in _EVENT_TYPES:
        counts = counts.withColumn(f"n_{t}", F.coalesce(F.col(t), F.lit(0))).drop(t)
    pv = ev.groupBy("day").agg(
        F.round(
            F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)),
            2,
        ).alias("purchase_value")
    )
    return counts.join(pv, "day")


_A8_ORACLE = """
SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       COUNT(*) AS n_segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
GROUP BY c_nationkey
"""


@register("agg_collect", oracle=_A8_ORACLE)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → array_sort → array_join (determinism: collected order is
    partition-dependent, so it is ALWAYS sorted before leaving the operator)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.size(F.collect_set("c_mktsegment")).cast("long").alias("n_segments"),
    )


_A9_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_price
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_percentile", oracle=_A9_ORACLE)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles. 100 TB: exact percentile sorts each
    group — use percentile_approx (t-digest-style sketch, single pass) at
    scale; the approx variant is bench-tested, this exact one is the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.95)), 4).alias("p95_price"),
    )


_A10_ORACLE = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
       ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_stats", oracle=_A10_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
    )


@register("agg_hll_mergeable", oracle=None)  # sketch bytes engine-specific
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (DataSketches): build one sketch per
    event_type partition, union the sketches, estimate the global distinct
    user count — the re-aggregatable form a 100 TB rollup store needs
    (per-partition sketches persist; any slice re-aggregates without
    touching raw data).

    Property-tested: merged estimate == the single-pass estimate, and both
    within HLL error of the exact count. Rows-only (DuckDB has no
    DataSketches HLL; estimates are engine-specific)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.approx_count_distinct("user_id").alias("type_approx_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_users")
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users")
    )
    return merged.crossJoin(direct).select(
        "merged_users",
        "direct_users",
        (F.col("merged_users") == F.col("direct_users")).alias("merge_lossless"),
    )


_ARGMINMAX_ORACLE = """
SELECT c_nationkey,
       arg_max(c_name, c_acctbal) AS richest,
       arg_min(c_name, c_acctbal) AS poorest,
       ROUND(max(c_acctbal), 2) AS max_bal,
       ROUND(min(c_acctbal), 2) AS min_bal
FROM customer
GROUP BY c_nationkey
"""


@register("agg_argminmax", oracle=_ARGMINMAX_ORACLE)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): the latest-revision-per-page lookup
    shape (SURVEY §2.5 w7) as a single aggregate instead of a window — one
    shuffle, no sort. Values are continuous doubles, so the argmax is
    tie-free (hash-verified against DuckDB's arg_max)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(o_totalprice / 25000) AS INT) AS bin,
       ROUND(CAST(FLOOR(o_totalprice / 25000) AS INT) * 25000.0, 2) AS bin_lo,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS bin_min,
       ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders
GROUP BY bin
"""


@register("agg_histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x41: fixed-width histogram of order totals (25k bins).

    Binning is integer FLOOR arithmetic rather than ``width_bucket`` so the
    oracle is portable (DuckDB 1.0 lacks width_bucket; FLOOR yields an
    integral double on both engines, so the int cast is exact — the
    round-vs-truncate CAST divergence never applies). 100 TB: a histogram
    is the textbook partial-agg query — the shuffle carries |bins| rows per
    map task regardless of input size; this exact shape (bounded key
    domain) is also what drives the skew/salt decisions elsewhere."""
    orders = load_table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 25000).cast("int")
    return (
        orders.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 25000.0, 2).alias("bin_lo"),
            "n",
            "bin_min",
            "bin_max",
        )
    )


_HEAVY_ORACLE = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
t AS (SELECT SUM(n) AS total, COUNT(*) AS n_users FROM c)
SELECT c.user_id, c.n, ROUND(c.n * 1.0 / t.total, 6) AS frac
FROM c, t
WHERE c.n * t.n_users > 1.2 * t.total
"""


@register("agg_heavy_hitters", oracle=_HEAVY_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x42: users with event volume > 1.2× the per-user average — the hot-key
    detector that feeds join salting / skew handling decisions.

    The threshold is self-normalizing (relative to the dataset's own mean),
    so the query is scale-factor-free. Shape: one groupBy(user_id) with
    map-side partials, then the 1-row totals frame broadcast-crossed back —
    no second scan of events, no driver-side action at plan time. At 100 TB
    the per-key count table is |users| rows — if even THAT is too big, the
    same contract is served by count-min sketch + a candidate pass; this
    exact version is the oracle for such a sketch."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_users"))
    return (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("n") * F.col("n_users") > 1.2 * F.col("total"))
        .select(
            "user_id", "n", F.round(F.col("n") / F.col("total"), 6).alias("frac")
        )
    )


# --------------------------------------------------------------------------
# x66 — linear-regression aggregates (OLS slope/intercept/R² per group)
# --------------------------------------------------------------------------

_REGR_ORACLE = """
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_regression", oracle=_REGR_ORACLE)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x66: OLS regression aggregates — slope/intercept/R² of extended
    price against quantity per return flag, via the SQL-standard
    regr_* family both engines implement natively (price ≈ unit price ×
    quantity, so slope approximates mean unit price and R² is high —
    a built-in sanity anchor).

    100 TB: regr_* are single-pass mergeable moment aggregates
    (sum/sum²/cross-product partials combine associatively), so this is
    one partial+final hash agg — the same shuffle profile as a10's
    stddev/corr, no second pass over the data."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# x70 — higher statistical moments with cross-engine definition mapping
# --------------------------------------------------------------------------

_MOMENTS_ORACLE = """
SELECT event_type,
       COUNT(value) AS n,
       ROUND(AVG(value), 6) AS mean_v,
       ROUND(stddev_samp(value), 6) AS stddev_v,
       ROUND(skewness(value) * (COUNT(value) - 2)
             / sqrt(COUNT(value) * (COUNT(value) - 1.0)), 6) AS skew_pop,
       ROUND(kurtosis_pop(value), 6) AS kurt_excess
FROM events
GROUP BY event_type
"""


@register("agg_moments", oracle=_MOMENTS_ORACLE)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x70: 3rd/4th statistical moments per group — the distribution-shape
    profile (skew, excess kurtosis) that a9's percentiles and a10's
    variance miss, e.g. spotting heavy-tailed spend before picking a
    clipping threshold. Single partial-aggregable pass (moment sketches
    merge), same scale shape as a2.

    Cross-engine definition mapping, established empirically (round 6):
    Spark's skewness/kurtosis are POPULATION moments (g1 = m3/m2^1.5,
    excess g2 = m4/m2^2 - 3); DuckDB's skewness is the bias-corrected
    SAMPLE statistic G1 = g1*sqrt(n(n-1))/(n-2) and its kurtosis the
    sample G2 — but kurtosis_pop matches Spark exactly. The oracle
    converts G1 back (×(n-2)/√(n(n-1))) and uses kurtosis_pop, so both
    engines compare the same population definition at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count("value")
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_v"),
        F.round(F.skewness("value"), 6).alias("skew_pop"),
        F.round(F.kurtosis("value"), 6).alias("kurt_excess"),
    )


# --------------------------------------------------------------------------
# x98 — Pareto / ABC classification by cumulative revenue share
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
cum AS (
  SELECT nation, rev_u,
         CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, nation
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_u,
         CAST(SUM(rev_u) OVER () AS BIGINT) AS tot_u
  FROM rev
)
SELECT nation,
       {pv} AS revenue,
       (CAST((((cum_u * CAST(2000000 AS HUGEINT) + tot_u) - (((cum_u * CAST(2000000 AS HUGEINT) + tot_u) % (2 * CAST(tot_u AS HUGEINT)) + (2 * CAST(tot_u AS HUGEINT))) % (2 * CAST(tot_u AS HUGEINT)))) // (2 * CAST(tot_u AS HUGEINT))) AS BIGINT) / 1000000.0) AS cum_share,
       CASE WHEN 2 * cum_u <= tot_u THEN 'A'
            WHEN 5 * cum_u <= 4 * tot_u THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum
""".format(pv=_pin2_sql("rev_u", 10000))


@register("pareto_abc", oracle=_PARETO_ORACLE)
def pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x98: Pareto / ABC classification — nations ranked by revenue with
    their CUMULATIVE share of the total, bucketed A (first 50%), B (to
    80%), C (tail). The canonical inventory/portfolio analysis: a running
    total over a global ordering divided by a grand total.

    Determinism (r11 sweep): per-nation revenue, the running total, and
    the grand total are all exact integer 1e-4-dollar sums; the A/B
    boundaries are the exact integer compares 2*cum <= tot and
    5*cum <= 4*tot (x116's device), and the displayed revenue/share each
    divide once — no float accumulation or float threshold anywhere.

    100 TB: the star agg collapses to |nations| rows before the
    single-partition window touches anything — an unpartitioned window is
    only safe BECAUSE the grain is dim-sized; the same report at customer
    grain would need the two-pass percentile/bin approach instead."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                * (100 - F.floor(F.col("l_discount") * 100 + 0.5).cast("long"))
            ).alias("rev_u")
        )
    )
    w_run = (
        Window.orderBy(F.col("rev_u").desc(), F.col("nation"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_u = F.sum("rev_u").over(w_run)
    tot_u = F.sum("rev_u").over(w_all)
    return rev.select(
        "nation",
        _pin2(F.col("rev_u"), 10000).alias("revenue"),
        _ratio_pin(cum_u, tot_u, 1, 6).alias("cum_share"),
        F.when(2 * cum_u <= tot_u, F.lit("A"))
        .when(5 * cum_u <= 4 * tot_u, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


# --------------------------------------------------------------------------
# x99 — weighted median / weighted percentiles via pinned cumulative weights
# --------------------------------------------------------------------------

_WPCT_ORACLE = """
WITH pts AS (
  SELECT l_returnflag AS flag, l_quantity AS v,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem
),
cum AS (
  SELECT flag, v, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY v, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM pts
)
SELECT flag, MIN(v) AS weighted_median
FROM cum
WHERE 2 * cw >= tw
GROUP BY flag
"""


@register("agg_weighted_percentile", oracle=_WPCT_ORACLE)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x99: WEIGHTED median — smallest quantity at which the cumulative
    extendedprice weight reaches half the group's total (per returnflag).
    Neither engine ships a weighted percentile; the portable spelling is a
    pinned-order cumulative weight + threshold-crossing MIN.

    Determinism by INTEGER arithmetic: weights are converted to integer
    CENTS before any summation, so both the pinned-order running total cw
    and the unordered partition total tw are exact at every summation
    order (a 2dp DOUBLE would not be — 0.01 has no finite binary form,
    and tw's unordered sum could then drift by an ulp across engines).
    The median crossing test is 2*cw >= tw — integers end to end.

    100 TB: r14 — the running sum runs at VALUE grain, not row grain. The
    old spelling partitioned every row by flag (|flags| = 3 ⇒ three
    single-threaded whole-corpus sorts — the §2 skew hazard embodied).
    Rows with equal v are contiguous in the pinned order and cw is
    nondecreasing, so a v-block contains a crossing row iff its LAST row
    crosses, whose cw is exactly the value-grain cumulative weight
    Σ_{v'≤v} w(v') — the threshold-crossing MIN over (flag, v, Σw) rows is
    therefore value-identical to the row-grain filter (exact integers end
    to end, no order dependence). One map-combined groupBy(flag, v)
    shuffle (state bounded by the quantity domain, ~50 values at any
    corpus size) and a window over ≤|domain| rows per flag."""
    li = load_table(spark, sf_dir, "lineitem")
    wv = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").alias("v"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
        )
        .groupBy("flag", "v")
        .agg(F.sum("w").alias("w"))
    )
    w_run = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    cum = wv.select(
        "flag",
        "v",
        F.sum("w").over(w_run).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("v").alias("weighted_median"))
    )


# --------------------------------------------------------------------------
# x100 — market-basket brand co-occurrence (support + lift)
# --------------------------------------------------------------------------

_BASKET_SQL = """
WITH n_orders AS (SELECT COUNT(DISTINCT ok) AS n FROM {basket}),
brand_n AS (SELECT brand, COUNT(*) AS n_b FROM {basket} GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
  FROM {basket} a JOIN {basket} b ON a.ok = b.ok AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.brand_a, p.brand_b, p.n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / (SELECT n FROM n_orders), 6) AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) * (SELECT n FROM n_orders)
             / (na.n_b * nb.n_b), 6) AS lift
FROM pairs p
JOIN brand_n na ON na.brand = p.brand_a
JOIN brand_n nb ON nb.brand = p.brand_b
WHERE p.n_ab >= 20
"""


_BASKET_CTE_ORACLE = (
    """
WITH basket_t AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)"""
    + _BASKET_SQL.format(basket="basket_t").replace("WITH ", ", ", 1)
)


def _brand_mask_hist(spark: SparkSession, sf_dir: str):
    """Shared brand-mask histogram kernel for the basket queries (x100,
    x299 — r14): returns ``(brands, joined, hist, n_orders)`` where
    ``hist`` is the eagerly-pinned histogram of distinct per-order brand
    MASKS (bit i = sorted-brand i present) — bounded by
    min(|orders|, 2^|brands|) rows of two longs at ANY corpus size — and
    ``n_orders`` the grand total folded to a driver literal. When the
    brand domain exceeds the 62-bit mask budget, ``hist``/``n_orders``
    come back None and callers take their per-basket fallback on
    ``joined``.

    Both driver hops are bounded by construction (ledgered in
    tests/test_collect_ledger.py): the brand DOMAIN (≤62 values on the
    mask path) and ONE 8-byte scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brands = sorted(
        r[0] for r in part.select("p_brand").distinct().collect()
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    if len(brands) > _BASKET_MASK_MAX_BRANDS:
        return brands, joined, None, None
    powers = [1 << i for i in range(len(brands))]
    bit_of = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for b, p in zip(brands, powers)
                for x in (b, p)
            ]
        ),
        F.col("p_brand"),
    )
    # Histogram of distinct brand masks — ≤ min(|orders|, 2^|brands|) rows,
    # eagerly pinned so every consumer reads it instead of the corpus agg.
    hist = (
        joined.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.bit_or(bit_of).alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    # Single 8-byte scalar to the driver — the grand total every ratio
    # shares; the bounded analog of the oracle's scalar subquery.
    n_orders = hist.agg(F.sum("cnt")).collect()[0][0]
    return brands, joined, hist, n_orders


@register("basket_brand_pairs", oracle=_BASKET_CTE_ORACLE)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x100: market-basket analysis — brand pairs co-occurring in the same
    order, with SUPPORT (share of all orders) and LIFT (observed/expected
    co-occurrence). The association-rule primitive every retail pipeline
    runs; the oracle spells the totals
    as scalar subqueries; the Spark side folds the single grand total in
    as a literal after one bounded count (no crossJoin, no BNLJ).

    All counts are integers, so support and lift divide exact operands —
    the ROUND is presentation pinning, not drift control.

    100 TB: the brand domain is tiny and FIXED (≤ a few dozen values at any
    scale factor), so each basket compresses to a ≤62-bit brand MASK and
    every count the query needs reduces to sums over the mask HISTOGRAM —
    a frame bounded by min(|orders|, 2^|brands|) rows of two longs, never
    by corpus size. One (order)-grain bit_or shuffle (8-byte payload where
    the old collect_set shuffled string arrays), one bounded histogram
    agg, then all explode/pair fan-out runs on the histogram: n_ab(a,b) =
    Σ cnt over masks containing both bits, n_b = Σ cnt over masks with the
    bit, n_orders = Σ cnt — the same exact integers as the per-basket
    spelling, proven by the pair-identity test. Bit ids are assigned by
    sorted brand string, so id order ≡ brand_a < brand_b string order.
    A corpus with a brand domain past 62 falls back to the per-basket
    double-explode (same results; bounded-basket discipline documented in
    the git history)."""
    brands, joined, hist, n_orders = _brand_mask_hist(spark, sf_dir)
    if hist is None:
        return _basket_brand_pairs_explode(joined)
    powers = [1 << i for i in range(len(brands))]
    # Bit extraction as a codegen'd explode+filter (a higher-order
    # F.filter lambda A/B'd ~80% slower — HOFs are interpreted per
    # element); fan-out ≤ |hist|·|brands|², bounded at any corpus size.
    seq = F.sequence(F.lit(0), F.lit(len(brands) - 1))
    p_at = lambda c: F.element_at(F.lit(powers), c + 1)  # noqa: E731
    brand_of = lambda c: F.element_at(  # noqa: E731
        F.lit(brands), c.cast("int") + 1
    )
    ex = hist.select(F.explode(seq).alias("i"), "mask", "cnt").filter(
        F.col("mask").bitwiseAND(p_at(F.col("i"))) != 0
    )
    brand_n = ex.groupBy(F.col("i").alias("b")).agg(
        F.sum("cnt").alias("n_b")
    )
    pairs = (
        ex.select("i", F.explode(seq).alias("j"), "mask", "cnt")
        .filter(
            (F.col("j") > F.col("i"))
            & (F.col("mask").bitwiseAND(p_at(F.col("j"))) != 0)
        )
        .groupBy(F.col("i").alias("a"), F.col("j").alias("b"))
        .agg(F.sum("cnt").alias("n_ab"))
    )
    na = brand_n.select(F.col("b").alias("a"), F.col("n_b").alias("na"))
    nb = brand_n.select(F.col("b"), F.col("n_b").alias("nb"))
    return (
        pairs.filter(F.col("n_ab") >= 20)
        .join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            brand_of(F.col("a")).alias("brand_a"),
            brand_of(F.col("b")).alias("brand_b"),
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.lit(n_orders), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.lit(n_orders)
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


_BASKET_MASK_MAX_BRANDS = 62


def _basket_brand_pairs_explode(joined: DataFrame) -> DataFrame:
    """Pre-r14 per-basket spelling of x100 — the >62-brand fallback. The
    pair generator is a per-basket double-explode whose fan-out is bounded
    by basket size (≤ brands-per-order², ~49 here), never by corpus size."""
    baskets = (
        joined.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.collect_set("p_brand").alias("bs"))
        .localCheckpoint()
    )
    n_orders = baskets.count()
    brand_n = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    pairs = (
        baskets.select(F.explode("bs").alias("brand_a"), "bs")
        .select("brand_a", F.explode("bs").alias("brand_b"))
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = brand_n.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("na"))
    nb = brand_n.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.filter(F.col("n_ab") >= 20)
        .join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.lit(n_orders), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.lit(n_orders)
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# x106 — discrete percentiles by integer rank arithmetic
# --------------------------------------------------------------------------

_PDISC_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority AS priority, o_totalprice AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT priority,
       ROUND(MIN(CASE WHEN rk = (n + 3) // 4 THEN v END), 2) AS p25,
       ROUND(MIN(CASE WHEN rk = (n + 1) // 2 THEN v END), 2) AS p50,
       ROUND(MIN(CASE WHEN rk = (9 * n + 9) // 10 THEN v END), 2) AS p90,
       MAX(n) AS n
FROM ranked GROUP BY priority
"""


@register("agg_percentile_disc", oracle=_PDISC_ORACLE)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x106: DISCRETE percentiles — the actual data value at rank
    ceil(p·n), never an interpolated synthetic (a9 covers the continuous
    family). Rank targets are pure integer arithmetic — ceil(n/4) spelled
    (n+3)//4 etc. — so there is no float percentile position to disagree
    about; ties in v are broken by orderkey so the SELECTED ROW is pinned,
    and equal values make the choice value-identical anyway.

    100 TB: one shuffle on the group key; the row_number + count pair
    share one sort. For heavy groups the two-pass histogram approach
    (x41) trades exactness for a second scan — discrete percentile's
    single full sort per group is the honest exact cost."""
    orders = load_table(spark, sf_dir, "orders")
    # r15 (guide §2.3): alias BEFORE the window so the rank exchange
    # carries 3 narrow columns, not the aliased+original 5-column pair
    # (windowing on the originals kept both alive through the shuffle),
    # and the final groupBy('priority') rides the window's partitioning
    # instead of re-exchanging. Same rows, same ordering keys —
    # interleaved 5-shot medians 0.70 -> 0.54 s at sf0.1.
    pts = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderkey").alias("ok"),
    )
    w = Window.partitionBy("priority").orderBy("v", "ok")
    ranked = pts.select(
        "priority",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    pick = lambda target: F.round(  # noqa: E731
        F.min(F.when(F.col("rk") == target, F.col("v"))), 2
    )
    return ranked.groupBy("priority").agg(
        pick(F.floor((F.col("n") + 3) / 4)).alias("p25"),
        pick(F.floor((F.col("n") + 1) / 2)).alias("p50"),
        pick(F.floor((9 * F.col("n") + 9) / 10)).alias("p90"),
        F.max("n").alias("n"),
    )


# --------------------------------------------------------------------------
# x116 — scalable ABC classification via histogram bins (two-pass)
# --------------------------------------------------------------------------

_ABC_BIN_CENTS = 1_000_00  # $1000 revenue bins

_ABC_SCALE_ORACLE = f"""
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
),
binned AS (SELECT o_custkey, cents, cents // {_ABC_BIN_CENTS} AS bin FROM rev),
bins AS (SELECT bin, SUM(cents) AS bin_cents FROM binned GROUP BY bin),
run AS (
  SELECT bin,
         SUM(bin_cents) OVER (ORDER BY bin DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_cents,
         SUM(bin_cents) OVER () AS total_cents
  FROM bins
),
classed AS (
  SELECT bin,
         CASE WHEN 2 * cum_cents <= total_cents THEN 'A'
              WHEN 5 * cum_cents <= 4 * total_cents THEN 'B'
              ELSE 'C' END AS abc_class
  FROM run
)
SELECT b.o_custkey, ROUND(b.cents / 100.0, 2) AS revenue, c.abc_class
FROM binned b JOIN classed c ON b.bin = c.bin
"""


@register("pareto_abc_scalable", oracle=_ABC_SCALE_ORACLE)
def pareto_abc_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x116: ABC classification at CUSTOMER grain — the two-pass histogram
    form x98's docstring promises for grains too large for a single-
    partition running window: bin each entity's revenue ($1000 bins),
    run the cumulative share over the SMALL bin table (ordered richest
    bin first), classify BINS, and broadcast the bin→class map back onto
    entities. Class boundaries land on bin edges — the documented
    approximation vs x98's exact per-entity cut; shrink the bin width to
    tighten it.

    Determinism: line revenues round to integer cents at the row level,
    every aggregate and the class thresholds are exact integer arithmetic
    (2·cum ≤ total, 5·cum ≤ 4·total) — no float touches the decision.

    100 TB: pass 1 is one fact shuffle to entity grain; the bin table is
    ~|revenue-range|/width rows regardless of entity count, so the window
    never sees the big side; the class map broadcasts back. This is the
    standard decile/ABC-at-scale shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    # rev feeds two consumers (bin histogram + final class join) over the
    # SAME canonicalized agg subplan, so ReuseExchange shares one compute —
    # measured: adding a localCheckpoint here changed nothing (contrast
    # trap #16, where differing projections defeated reuse).
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("cents"))
        .withColumn("bin", F.floor(F.col("cents") / _ABC_BIN_CENTS))
    )
    bins = rev.groupBy("bin").agg(F.sum("cents").alias("bin_cents"))
    w_run = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    classed = bins.select(
        "bin",
        F.sum("bin_cents").over(w_run).alias("cum_cents"),
        F.sum("bin_cents").over(w_all).alias("total_cents"),
    ).select(
        "bin",
        F.when(2 * F.col("cum_cents") <= F.col("total_cents"), F.lit("A"))
        .when(5 * F.col("cum_cents") <= 4 * F.col("total_cents"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return rev.join(F.broadcast(classed), "bin").select(
        "o_custkey",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        "abc_class",
    )


# --------------------------------------------------------------------------
# x135 — Gini concentration of customer revenue (exact integer/decimal)
# --------------------------------------------------------------------------

_GINI_ORACLE = """
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i FROM c
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS tot,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS sw
  FROM r
)
SELECT n, CAST(tot AS BIGINT) AS total_cents,
       ROUND(CAST(2 * sw - (n + 1) * tot AS DOUBLE)
             / CAST(n * tot AS DOUBLE), 6) AS gini
FROM s
"""


@register("agg_gini_concentration", oracle=_GINI_ORACLE)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x135: GINI coefficient of customer revenue — the single-number
    concentration measure next to pareto_abc's classing: G =
    (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending-sorted revenues.
    Money is integer cents (x49 lesson) and BOTH big sums accumulate in
    DECIMAL(38,0): Σi·xᵢ grows as n²·x̄, which silently wraps a BIGINT
    near ~1.5M customers × real revenues — the decimal accumulator is the
    100 TB overflow discipline, not pedantry. Exactly one float op at the
    end (decimal→double casts + one divide, correctly rounded on both
    engines).

    100 TB: customer-grain agg, then the rank runs over the |customers|
    table — x98's "safe at dim cardinality" rationale; beyond that, the
    binned two-level form (x116) computes the same sums per bin with a
    closed-form intra-bin rank series. Final agg is 3 numbers."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    r = c.select("cents", F.row_number().over(w).alias("i"))
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("tot"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sw"),
    )
    return s.select(
        "n",
        F.col("tot").cast("long").alias("total_cents"),
        F.round(
            (2 * F.col("sw") - (F.col("n") + 1) * F.col("tot")).cast("double")
            / (F.col("n") * F.col("tot")).cast("double"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# x146 — exact distinct counting via bitmap partial aggregates
# --------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x146: EXACT distinct counting via Spark's bitmap aggregate family —
    per event_type, distinct users computed as bitmap_construct_agg over
    bit positions inside 32k-wide buckets, then sum(bitmap_count). Same
    answer as COUNT(DISTINCT) (the oracle), radically different machinery:
    the partial-agg state per (group, bucket) is a fixed 4 KB bitmap that
    ORs associatively map-side, instead of the per-distinct-value hash
    rows an expand+distinct agg shuffles. a4/x21 trade exactness for HLL's
    1.5 KB sketch; this keeps exactness at ~1 bit per POSSIBLE id — the
    right tool when ids are dense integers (user ids, order keys).

    100 TB: shuffle volume is |groups| × |occupied buckets| × 4 KB,
    independent of row count; bucket-grain parallelism also removes the
    single-reducer-per-group bottleneck exact distinct normally has. Ids
    must be integral; sparse/huge id spaces re-densify through a
    dictionary join first (or fall back to a4's HLL)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.select("event_type", "user_id")
        .groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    )
    return buckets.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )


# --------------------------------------------------------------------------
# x158 — distribution-free median confidence interval (order statistics)
# --------------------------------------------------------------------------

_MCI_Z = 1.959964

_MCI_ORACLE = f"""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
g AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY cents
),
c AS (
  SELECT cents, t,
         SUM(t) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM g
),
n AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM g),
r AS (
  SELECT n,
         (n + 1) // 2 AS r_med,
         GREATEST(1, CAST(FLOOR((n - ({_MCI_Z!r} * sqrt(n))) / 2.0)
                          AS BIGINT)) AS r_lo,
         LEAST(n, CAST(CEIL((n + ({_MCI_Z!r} * sqrt(n))) / 2.0) AS BIGINT)
                  + 1) AS r_hi
  FROM n
)
SELECT r.n, r.r_lo, r.r_med, r.r_hi,
       ROUND(CAST(MIN(CASE WHEN c.cum >= r.r_lo THEN c.cents END) AS DOUBLE)
             / 100.0, 2) AS ci_lo,
       ROUND(CAST(MIN(CASE WHEN c.cum >= r.r_med THEN c.cents END) AS DOUBLE)
             / 100.0, 2) AS median,
       ROUND(CAST(MIN(CASE WHEN c.cum >= r.r_hi THEN c.cents END) AS DOUBLE)
             / 100.0, 2) AS ci_hi
FROM c CROSS JOIN r
GROUP BY r.n, r.r_lo, r.r_med, r.r_hi
"""


@register("agg_median_ci", oracle=_MCI_ORACLE)
def agg_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x158: DISTRIBUTION-FREE median confidence interval — the classic
    order-statistic CI: the 95 % interval for the population median is
    (x₍ₗ₎, x₍ᵤ₎) with l = max(1, ⌊(n − z√n)/2⌋) and
    u = min(n, ⌈(n + z√n)/2⌉ + 1), z = {_MCI_Z} — from the binomial
    normal approximation of sign counts; NO normality assumed of the data
    (x10's agg_stats CI devices assume it). The convention (floor/ceil/+1,
    clamped) is pinned here and in the oracle.

    Exactness: rank selection happens at VALUE grain via cumulative
    counts (x106's device) — value at rank r = min value with cum ≥ r, an
    integer pick; the only floats are the three rank formulas (identical
    op order, one sqrt) and the dollar epilogue.

    100 TB: value-grain agg collapses map-side (price-grid bounded); the
    rank frame is 1 row broadcast onto it; no row-grain sort ever —
    contrast with a naive ORDER BY + OFFSET median."""
    orders = load_table(spark, sf_dir, "orders")
    # r15 (guide §2.4): g feeds TWO consumers (the cumulative frame and
    # the 1-row n/rank frame), each re-deriving the corpus scan + value
    # agg. One eager pin — the frame is value-grain, bounded by the price
    # grid at any corpus size. Interleaved 5-shot medians 0.90 -> 0.78 s;
    # corpus scans 2 -> 1.
    g = (
        orders.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .localCheckpoint()
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select("cents", "t", F.sum("t").over(wcum).alias("cum"))
    n = g.agg(F.sum("t").cast("long").alias("n"))
    sq = F.sqrt(F.col("n").cast("double"))
    r = n.select(
        "n",
        F.expr("(n + 1) DIV 2").alias("r_med"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.col("n") - (F.lit(_MCI_Z) * sq)) / F.lit(2.0)).cast("long"),
        ).alias("r_lo"),
        F.least(
            F.col("n"),
            F.ceil((F.col("n") + (F.lit(_MCI_Z) * sq)) / F.lit(2.0)).cast("long")
            + 1,
        ).alias("r_hi"),
    )

    def pick(rank_col):
        return F.round(
            F.min(F.when(F.col("cum") >= F.col(rank_col), F.col("cents")))
            .cast("double")
            / 100.0,
            2,
        )

    return (
        c.crossJoin(F.broadcast(r))
        .groupBy("n", "r_lo", "r_med", "r_hi")
        .agg(
            pick("r_lo").alias("ci_lo"),
            pick("r_med").alias("median"),
            pick("r_hi").alias("ci_hi"),
        )
        .select("n", "r_lo", "r_med", "r_hi", "ci_lo", "median", "ci_hi")
    )


# --------------------------------------------------------------------------
# x164 — Herfindahl-Hirschman market concentration per nation
# --------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey,
         l.l_suppkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
agg AS (
  SELECT s_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         SUM(CAST(cents AS HUGEINT) * cents) AS sum_sq,
         CAST(MAX(cents) AS BIGINT) AS max_cents
  FROM rev GROUP BY s_nationkey
)
SELECT s_nationkey, n_suppliers,
       ROUND(CAST(sum_sq AS DOUBLE)
             / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)),
             6) AS hhi,
       ROUND(CAST(max_cents AS DOUBLE) / total_cents, 6) AS top_share
FROM agg
"""


@register("agg_herfindahl", oracle=_HHI_ORACLE)
def agg_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x164: HERFINDAHL-HIRSCHMAN INDEX — supplier revenue concentration
    per nation: HHI = Σ shareᵢ² (1/n = perfect competition … 1 =
    monopoly), plus the top-supplier share. The antitrust-grade
    concentration measure next to x136's Gini (inequality of the whole
    distribution) and x42's heavy hitters (who the big ones are): HHI is
    the one that moves when the top two merge.

    Exactness: Σsᵢ² runs in DECIMAL(38,0)/HUGEINT accumulators — supplier
    revenue cents square past BIGINT at real scale (1e12² = 1e24); the
    exact integer Σsᵢ² and (Σsᵢ)² convert to double once each, so
    HHI = Σsᵢ²/S² needs no per-share float ever.

    100 TB: lineitem⋈supplier is a broadcast join (supplier dim);
    revenue agg partial-aggregates map-side; the HHI agg runs at
    |nations| grain."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    agg = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sum_sq"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    tot = F.col("total_cents").cast("double")
    return agg.select(
        "s_nationkey",
        "n_suppliers",
        F.round(F.col("sum_sq").cast("double") / (tot * tot), 6).alias("hhi"),
        F.round(F.col("max_cents").cast("double") / F.col("total_cents"), 6).alias(
            "top_share"
        ),
    )


# --------------------------------------------------------------------------
# x170 — boolean aggregate family (every / any / count_if)
# --------------------------------------------------------------------------

_BOOL_ORACLE = """
SELECT c_mktsegment,
       bool_and(c_acctbal > -999.0) AS none_at_floor,
       bool_or(c_acctbal < 0.0) AS any_negative,
       CAST(COUNT(CASE WHEN c_acctbal > 5000.0 THEN 1 END) AS BIGINT)
         AS n_high_balance
FROM customer GROUP BY c_mktsegment
"""


@register("agg_boolean_family", oracle=_BOOL_ORACLE)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x170: the BOOLEAN aggregate family — every/bool_and, some/bool_or,
    count_if per segment: the vocabulary of declarative data-quality
    assertions (x93's dq_constraints composes exactly these; this row
    gives them first-class coverage). Predicates on doubles compare
    exactly (no arithmetic), so the whole row is deterministic.

    100 TB: one partial-aggregated scan — boolean partial states are a
    byte each, count_if a long; the cheapest aggregate family there is."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > -999.0).alias("none_at_floor"),
        F.bool_or(F.col("c_acctbal") < 0.0).alias("any_negative"),
        F.count_if(F.col("c_acctbal") > 5000.0).cast("long").alias("n_high_balance"),
    )


# --------------------------------------------------------------------------
# x183 — exact DECIMAL money aggregation (first-class, no integer-cents trick)
# --------------------------------------------------------------------------
# Everywhere else this repo pins money as BIGINT cents; this row exercises
# the engines' NATIVE exact-decimal path instead: cast to DECIMAL at the
# scan, multiply under SQL decimal typing (scale 2 × scale 2 → scale 4,
# exact), SUM in decimal (Spark widens precision by 10; DuckDB accumulates
# in HUGEINT) — no float enters at any point, so no round() pinning is
# needed. The compared value is the canonical DECIMAL(38,4) string (the
# driver's pandas hash treats decimal objects engine-specifically; the
# string form is exact and canonical — trailing zeros fixed by the scale).

_DECIMAL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4))
            AS VARCHAR) AS gross,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(4,2))
                        - CAST(l_discount AS DECIMAL(4,2))))
            AS DECIMAL(38,4)) AS VARCHAR) AS net
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_decimal_exact", oracle=_DECIMAL_ORACLE)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x183: EXACT DECIMAL money aggregation — TPC-H Q1's money columns
    computed entirely in SQL DECIMAL arithmetic (a2 computes the same
    shape in rounded doubles): prices cast to DECIMAL(18,2) at the scan,
    net = price·(1−discount) exact at scale 4, sums exact at any row
    count. This is the arithmetic a financial pipeline must run — float
    money drifts ~1 ulp per 2⁵³ of accumulated magnitude, and the
    integer-cents trick used elsewhere here caps the product scale by
    hand; native DECIMAL is the engine-supported third way, and Tungsten
    holds DECIMAL(≤18,s) in a LONG internally (UnsafeRow), so the partial
    aggregation stays codegen until the sum widens past 18 digits.

    100 TB: one partial-aggregated scan, |flag×status| cells; DECIMAL sums
    are mergeable partials like any SUM. The module-wide caveat about
    cross-engine decimal TYPING (Spark p1+p2+1 vs DuckDB w1+w2 product
    precision) is why both sides pin the OUTPUT type to DECIMAL(38,4)
    explicitly and compare its canonical string."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(4,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(price).cast("decimal(38,4)").cast("string").alias("gross"),
        F.sum(price * (one - disc)).cast("decimal(38,4)").cast("string").alias("net"),
    )


# --------------------------------------------------------------------------
# x184 — approximate percentile sketch (GK) — the at-scale quantile path
# --------------------------------------------------------------------------

_PSKETCH_ACC = 10000  # GK accuracy knob: rank error ≤ n / accuracy


@register("agg_percentile_sketch", oracle=None)  # sketch internals are
# engine-specific (Spark GK vs DuckDB t-digest) — rows-only by declaration;
# the GK rank-error bound is property-tested against the exact quantiles.
def agg_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x184: APPROXIMATE percentiles (p50/p90/p99 of event value per type)
    via percentile_approx — Spark's Greenwald-Khanna sketch. a9 computes
    exact percentiles with a full sort per group; that is the correctness
    baseline and this row is the 100 TB path: GK state is
    O(accuracy·log n) per group, MERGEABLE across partitions (a partial
    sketch per map task, one combine — same contract as x21's HLL and
    x144's bitmaps), and never materializes a per-group sort. Guarantee:
    each reported value's true rank is within n/{acc} of the target rank —
    asserted by tests against a9-style exact quantiles.

    Rows-only by declaration: DuckDB's approx_quantile is a t-digest with
    different (and unspecified-order) internals, so no cross-engine hash
    can exist for any approximate sketch — exactly the a4/x21 carve-out.

    100 TB: one map-combined agg, |types| output rows; raise accuracy for
    tighter tails (state grows linearly), or keep per-day partial sketches
    and merge across days for a continuous-aggregate quantile table."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, _PSKETCH_ACC).alias("p50"),
        F.percentile_approx("value", 0.9, _PSKETCH_ACC).alias("p90"),
        F.percentile_approx("value", 0.99, _PSKETCH_ACC).alias("p99"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --------------------------------------------------------------------------
# x195 — exact one-pass Pearson correlation MATRIX
# --------------------------------------------------------------------------
# a10 verifies the built-in corr() on one pair; this row computes the full
# 4×4 upper triangle of lineitem's numeric columns from ONE partial-
# aggregated pass of exact integer moments (each column quantized to its
# natural unit: qty×100, price cents, disc/tax hundredths), corr =
# (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) as a pinned epilogue.
# Second moments overflow BIGINT around sf0.1 (Σ price² ≈ 6e19) — all
# cross/second moments accumulate in DECIMAL(38,0)/HUGEINT.

_CORRM_COLS = ("qty", "price", "disc", "tax")


def _corrm_pair_sql(a: str, b: str) -> str:
    return f"""
SELECT '{a}' AS col_x, '{b}' AS col_y,
       ROUND((n * sxy_{a}_{b} - s_{a} * s_{b})
             / (sqrt(CAST(n * s2_{a} - s_{a} * s_{a} AS DOUBLE))
                * sqrt(CAST(n * s2_{b} - s_{b} * s_{b} AS DOUBLE))), 6)
         AS corr
FROM m"""


_CORRM_ORACLE = (
    """
WITH q AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
"""
    + ",\n".join(
        f"         CAST(SUM({c}) AS HUGEINT) AS s_{c},\n"
        f"         SUM(CAST({c} AS HUGEINT) * {c}) AS s2_{c}"
        for c in _CORRM_COLS
    )
    + ","
    + ",\n".join(
        f"         SUM(CAST({a} AS HUGEINT) * {b}) AS sxy_{a}_{b}"
        for i, a in enumerate(_CORRM_COLS)
        for b in _CORRM_COLS[i + 1 :]
    )
    + "\n  FROM q\n)\n"
    + "\nUNION ALL".join(
        _corrm_pair_sql(a, b)
        for i, a in enumerate(_CORRM_COLS)
        for b in _CORRM_COLS[i + 1 :]
    )
)


@register("agg_corr_matrix", oracle=_CORRM_ORACLE)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x195: the full PEARSON CORRELATION MATRIX (upper triangle, 6 pairs)
    of lineitem's numeric columns from ONE pass of exact integer moments
    (module comment) — the feature-screening table every modeling
    pipeline starts with. The built-in corr() (verified by a10) computes
    the same number per pair but one pair per aggregate; the moment form
    shares a single scan for all pairs AND keeps the accumulators exact
    (float co-moment partials are summation-order-dependent, so built-in
    corr can drift a ulp across engines — the integer form cannot).

    100 TB: one map-combined agg to 1 row of 15 numbers (4 sums, 4
    squares, 6 cross, n); the 6-row epilogue is driver-free. k columns
    need k(k+1)/2 accumulators — at k≈100s switch to the pandas-UDF GEMM
    X'X form (one Arrow batch per task, numpy dgemm, sum the partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORRM_COLS)
        for b in _CORRM_COLS[i + 1 :]
    ]
    # r14 (guide §4.2 + the docstring's own k≈100s note): the one-pass
    # moment agg ran 14 interpreted decimal(38,0) accumulators + 4
    # BigDecimal rounds PER ROW — 1.75 s vs a 0.21 s raw-sum floor at
    # sf0.1, and bigint cannot replace decimal (s2_price overflows int64
    # already at sf0.1). Now the X'X form: a mapInPandas kernel quantizes
    # (half-away-from-zero — identical to round(x*100) for every 2dp/
    # integral input, which can never land within an ulp of a .5 boundary)
    # and accumulates EXACT integer partials (int64 GEMM in ≤8192-row
    # chunks, whose per-chunk products are ≤1e14·8192 < 2^63, merged into
    # unbounded Python ints), emitting ONE decimal(38,0) row per task.
    # Spark sums the per-task partials in decimal — the same exact
    # integers as before, so the corr epilogue is value-identical.
    # Precondition (holds for the driver tables): lineitem's numeric
    # columns are non-null — the old sum() would skip a NULL where this
    # kernel would poison the partial, so nullable inputs would need a
    # dropna first.
    import numpy as _np  # noqa: PLC0415

    _k = len(_CORRM_COLS)

    def _xtx_partials(batches):
        import decimal as _dec  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        n_rows = 0
        s = [0] * _k
        m2 = [[0] * _k for _ in range(_k)]
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.column_stack(
                [
                    pdf["l_quantity"].to_numpy(dtype=np.float64),
                    pdf["l_extendedprice"].to_numpy(dtype=np.float64),
                    pdf["l_discount"].to_numpy(dtype=np.float64),
                    pdf["l_tax"].to_numpy(dtype=np.float64),
                ]
            )
            x = raw * 100.0
            q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
            n_rows += len(q)
            for lo in range(0, len(q), 8192):
                chunk = q[lo : lo + 8192]
                cs = chunk.sum(axis=0)
                cm = chunk.T @ chunk
                for i in range(_k):
                    s[i] += int(cs[i])
                    for j in range(i, _k):
                        m2[i][j] += int(cm[i, j])
        out = {"n": [_dec.Decimal(n_rows)]}
        for i, c in enumerate(_CORRM_COLS):
            out[f"s_{c}"] = [_dec.Decimal(s[i])]
            out[f"s2_{c}"] = [_dec.Decimal(m2[i][i])]
        for i, a in enumerate(_CORRM_COLS):
            for j in range(i + 1, _k):
                out[f"sxy_{a}_{_CORRM_COLS[j]}"] = [_dec.Decimal(m2[i][j])]
        yield pd.DataFrame(out)

    _stat_cols = (
        ["n"]
        + [f(c) for c in _CORRM_COLS for f in (lambda c: f"s_{c}", lambda c: f"s2_{c}")]
        + [f"sxy_{a}_{b}" for a, b in pairs]
    )
    _schema = ", ".join(f"{c} decimal(38,0)" for c in _stat_cols)
    partials = li.select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).mapInPandas(_xtx_partials, schema=_schema)
    m = partials.agg(
        *[
            F.sum(c).cast("decimal(38,0)").alias(c)
            for c in _stat_cols
        ]
    )

    def corr_expr(a: str, b: str):
        num = (
            F.col("n") * F.col(f"sxy_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ).cast("double")
        den_a = F.sqrt(
            (
                F.col("n") * F.col(f"s2_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
            ).cast("double")
        )
        den_b = F.sqrt(
            (
                F.col("n") * F.col(f"s2_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
            ).cast("double")
        )
        return F.round(num / (den_a * den_b), 6)

    # ONE stack over the single 1-row aggregate: a 6-way union of selects
    # from `m` re-planned the scan+agg per branch (trap #11 — measured
    # 2.2 s; this form is one scan).
    wide = m.select(
        *[corr_expr(a, b).alias(f"c_{a}_{b}") for a, b in pairs]
    )
    stack_args = ", ".join(f"'{a}', '{b}', c_{a}_{b}" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) as (col_x, col_y, corr)"
    )


# --------------------------------------------------------------------------
# x196 — multiple regression (2 features) via normal equations, exact moments
# --------------------------------------------------------------------------
# y = b0 + b1·x1 + b2·x2 by the 2-predictor closed form on CENTERED
# co-moment sums (each exact: Sab = n·Σab − Σa·Σb in DECIMAL/HUGEINT):
#   det = S11·S22 − S12²,  b1 = (S22·S1y − S12·S2y)/det,
#   b2 = (S11·S2y − S12·S1y)/det,  b0 = ȳ − b1·x̄1 − b2·x̄2,
#   R² = (b1·S1y + b2·S2y)/Syy.
# b1/b2 are single pinned divisions of exact integers. b0 and R² are
# assembled FROM THE PUBLISHED 6dp slopes (not the unrounded ones) so both
# engines compose identical doubles — reproducibility of the shipped
# numbers over the last 1e-6 of the unpublished ones, same contract as
# x63's per-iteration pinning. x66 is the 1-feature case; k features need
# the pandas-UDF X'X GEMM (x195's note) + a driver-side k×k solve.

_REGM_ORACLE = """
WITH q AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS y,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1,
         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS x2
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(x1) AS HUGEINT) AS sx1,
         CAST(SUM(x2) AS HUGEINT) AS sx2,
         SUM(CAST(x1 AS HUGEINT) * x1) AS sx1x1,
         SUM(CAST(x2 AS HUGEINT) * x2) AS sx2x2,
         SUM(CAST(x1 AS HUGEINT) * x2) AS sx1x2,
         SUM(CAST(x1 AS HUGEINT) * y) AS sx1y,
         SUM(CAST(x2 AS HUGEINT) * y) AS sx2y,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM q
),
s AS (
  SELECT n, sy, sx1, sx2,
         n * sx1x1 - sx1 * sx1 AS s11, n * sx2x2 - sx2 * sx2 AS s22,
         n * sx1x2 - sx1 * sx2 AS s12, n * sx1y - sx1 * sy AS s1y,
         n * sx2y - sx2 * sy AS s2y, n * syy - sy * sy AS syy_c
  FROM m
),
b AS (
  SELECT n, sy, sx1, sx2, s1y, s2y, syy_c,
         ROUND(CAST(s22 * s1y - s12 * s2y AS DOUBLE)
               / CAST(s11 * s22 - s12 * s12 AS DOUBLE), 6) AS b1,
         ROUND(CAST(s11 * s2y - s12 * s1y AS DOUBLE)
               / CAST(s11 * s22 - s12 * s12 AS DOUBLE), 6) AS b2
  FROM s
)
SELECT CAST(n AS BIGINT) AS n, b1, b2,
       ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             - b1 * (CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE))
             - b2 * (CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS b0,
       ROUND((b1 * CAST(s1y AS DOUBLE) + b2 * CAST(s2y AS DOUBLE))
             / CAST(syy_c AS DOUBLE), 6) AS r2
FROM b
"""


@register("agg_regression_multi", oracle=_REGM_ORACLE)
def agg_regression_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x196: MULTIPLE REGRESSION (quantity on discount + tax) by exact-
    moment normal equations (module comment) — x66's simple OLS extended
    to the 2-predictor closed form, still ONE map-combined pass and a
    1-row epilogue: the "controlled effect" question (does discount move
    quantity HOLDING TAX FIXED?) that simple OLS confounds.

    100 TB: one partial-aggregated scan to 10 exact accumulators; no
    shuffle beyond the 1-row reduce. Column scaling note: centered sums
    are products of three n-scale integers — DECIMAL(38) holds to ~3e9
    rows at these units; past that, pre-center on a first-pass mean."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14 (guide §4.2, x195's X'X kernel mirrored): the one-pass moment agg
    # ran 6 interpreted decimal(38,0) product accumulators + 3 BigDecimal
    # rounds PER ROW — the same cost class the corr-matrix kernel removed.
    # The kernel quantizes half-away-from-zero (identical to round(x*100)
    # for every 2dp/integral input — such values can never land within an
    # ulp of a .5 boundary) and accumulates EXACT integer partials: int64
    # X'X over ≤8192-row chunks (per-chunk products ≤ 2.5e7·8192 ≪ 2^63 at
    # these units), merged into unbounded Python ints, ONE decimal(38,0)
    # row per task. Spark decimal-sums the per-task partials — the same
    # exact integers as the old agg, so the normal-equation epilogue is
    # value-identical. Precondition (holds for the driver tables): the
    # three columns are non-null — a NULL would poison the kernel partial
    # where the old sum() skipped it.
    _regm_stats = [
        "n", "sy", "sx1", "sx2",
        "sx1x1", "sx2x2", "sx1x2", "sx1y", "sx2y", "syy",
    ]

    def _regm_partials(batches):
        import decimal as _dec  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        n_rows = 0
        s = [0, 0, 0]
        m2 = [[0] * 3 for _ in range(3)]
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.column_stack(
                [
                    pdf["l_quantity"].to_numpy(dtype=np.float64),
                    pdf["l_discount"].to_numpy(dtype=np.float64),
                    pdf["l_tax"].to_numpy(dtype=np.float64),
                ]
            )
            x = raw * 100.0
            q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
            n_rows += len(q)
            for lo in range(0, len(q), 8192):
                chunk = q[lo : lo + 8192]
                cs = chunk.sum(axis=0)
                cm = chunk.T @ chunk
                for i in range(3):
                    s[i] += int(cs[i])
                    for j in range(i, 3):
                        m2[i][j] += int(cm[i, j])
        yield pd.DataFrame(
            {
                "n": [_dec.Decimal(n_rows)],
                "sy": [_dec.Decimal(s[0])],
                "sx1": [_dec.Decimal(s[1])],
                "sx2": [_dec.Decimal(s[2])],
                "sx1x1": [_dec.Decimal(m2[1][1])],
                "sx2x2": [_dec.Decimal(m2[2][2])],
                "sx1x2": [_dec.Decimal(m2[1][2])],
                "sx1y": [_dec.Decimal(m2[0][1])],
                "sx2y": [_dec.Decimal(m2[0][2])],
                "syy": [_dec.Decimal(m2[0][0])],
            }
        )

    partials = li.select("l_quantity", "l_discount", "l_tax").mapInPandas(
        _regm_partials,
        schema=", ".join(f"{c} decimal(38,0)" for c in _regm_stats),
    )
    m = partials.agg(
        *[F.sum(c).cast("decimal(38,0)").alias(c) for c in _regm_stats]
    )
    s = m.select(
        "n",
        "sy",
        "sx1",
        "sx2",
        (F.col("n") * F.col("sx1x1") - F.col("sx1") * F.col("sx1")).alias("s11"),
        (F.col("n") * F.col("sx2x2") - F.col("sx2") * F.col("sx2")).alias("s22"),
        (F.col("n") * F.col("sx1x2") - F.col("sx1") * F.col("sx2")).alias("s12"),
        (F.col("n") * F.col("sx1y") - F.col("sx1") * F.col("sy")).alias("s1y"),
        (F.col("n") * F.col("sx2y") - F.col("sx2") * F.col("sy")).alias("s2y"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("syy_c"),
    )
    det = (F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")).cast(
        "double"
    )
    b1 = F.round(
        (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")).cast("double")
        / det,
        6,
    )
    b2 = F.round(
        (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")).cast("double")
        / det,
        6,
    )
    b = s.select(
        "n", "sy", "sx1", "sx2", "s1y", "s2y", "syy_c",
        b1.alias("b1"), b2.alias("b2"),
    )
    nd = F.col("n").cast("double")
    return b.select(
        F.col("n").cast("long").alias("n"),
        "b1",
        "b2",
        F.round(
            F.col("sy").cast("double") / nd
            - F.col("b1") * (F.col("sx1").cast("double") / nd)
            - F.col("b2") * (F.col("sx2").cast("double") / nd),
            6,
        ).alias("b0"),
        F.round(
            (
                F.col("b1") * F.col("s1y").cast("double")
                + F.col("b2") * F.col("s2y").cast("double")
            )
            / F.col("syy_c").cast("double"),
            6,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# x209 — ABC × XYZ inventory matrix (value concentration × demand stability)
# --------------------------------------------------------------------------
# ABC at part grain reuses x116's binned two-pass device (integer-cent
# thresholds 2·cum ≤ tot / 5·cum ≤ 4·tot on the SMALL bin table). XYZ is
# demand variability over the part's observed demand weeks: CV of weekly
# quantity, decided by exact integer compares on CV² = (nΣq²−(Σq)²)/(Σq)²
# — X: 4·spread ≤ s1² (CV ≤ 1/2), Y: spread ≤ s1² (CV ≤ 1), Z else. Weeks
# with zero demand are not observed rows and therefore not in the CV (the
# documented simplification; densify via x37's gap-fill to include them).

_ABCXYZ_ORACLE = """
WITH q AS (
  SELECT l_partkey, date_trunc('week', l_shipdate) AS wk,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_wk,
         CAST(SUM(qty) AS HUGEINT) AS s1,
         SUM(CAST(qty AS HUGEINT) * qty) AS s2,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM q GROUP BY l_partkey
),
binned AS (SELECT *, CAST(FLOOR(cents / 100000) AS BIGINT) AS bin FROM p),
bins AS (SELECT bin, CAST(SUM(cents) AS BIGINT) AS bin_cents
         FROM binned GROUP BY bin),
classed AS (
  SELECT bin,
         CASE WHEN 2 * SUM(bin_cents) OVER w <= SUM(bin_cents) OVER ()
              THEN 'A'
              WHEN 5 * SUM(bin_cents) OVER w <= 4 * SUM(bin_cents) OVER ()
              THEN 'B' ELSE 'C' END AS abc_class
  FROM bins
  WINDOW w AS (ORDER BY bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
lab AS (
  SELECT b.l_partkey, b.cents, c.abc_class,
         CASE WHEN 4 * (b.n_wk * b.s2 - b.s1 * b.s1) <= b.s1 * b.s1
              THEN 'X'
              WHEN (b.n_wk * b.s2 - b.s1 * b.s1) <= b.s1 * b.s1
              THEN 'Y' ELSE 'Z' END AS xyz_class
  FROM binned b JOIN classed c ON b.bin = c.bin
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(cents) / 100.0, 2) AS revenue
FROM lab GROUP BY 1, 2
"""


@register("inventory_abc_xyz", oracle=_ABCXYZ_ORACLE)
def inventory_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x209: the ABC × XYZ INVENTORY MATRIX — parts classed by revenue
    concentration (A/B/C, x116's binned cumulative-share device at part
    grain) × weekly-demand stability (X/Y/Z by CV with exact integer
    verdicts — module comment), rolled up to the 9-cell planning matrix.
    AX cells get safety stock formulas; CZ cells get discontinued — this
    table IS the supply planner's segmentation, and it composes two
    devices this registry already attests (x116 binning, x185 integer-CV).

    100 TB: (part, week) agg → part agg (two map-combined shuffles); the
    ABC window runs on the ~|revenue-range|/width bin table, never on
    parts; XYZ verdicts are per-part O(1) in DECIMAL/HUGEINT; output is
    9 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy(
        "l_partkey", F.date_trunc("week", "l_shipdate").alias("wk")
    ).agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    # r14 (guide §2.4): p is part grain and feeds both the ABC bin table
    # and the final label join — without materialization the (part, week)
    # → part double agg over lineitem ran twice (14 Exchanges / 2 scans).
    # The ABC class frame keeps its explicit broadcast, so no join
    # strategy degrades.
    p = (
        q.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_wk"),
            F.sum("qty").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("qty").cast("decimal(19,0)") * F.col("qty")).alias("s2"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .withColumn("bin", F.floor(F.col("cents") / 100000))
        .localCheckpoint(eager=True)
    )
    bins = p.groupBy("bin").agg(F.sum("cents").alias("bin_cents"))
    w_run = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    classed = bins.select(
        "bin",
        F.when(
            2 * F.sum("bin_cents").over(w_run) <= F.sum("bin_cents").over(w_all),
            "A",
        )
        .when(
            5 * F.sum("bin_cents").over(w_run)
            <= 4 * F.sum("bin_cents").over(w_all),
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    spread = F.col("n_wk").cast("decimal(38,0)") * F.col("s2") - F.col("s1") * F.col("s1")
    s1sq = F.col("s1") * F.col("s1")
    xyz = (
        F.when(spread * 4 <= s1sq, "X")
        .when(spread <= s1sq, "Y")
        .otherwise("Z")
    )
    lab = p.join(F.broadcast(classed), "bin").select(
        "cents", "abc_class", xyz.alias("xyz_class")
    )
    return lab.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# x210 — fulfilment ship-lag percentiles (value-grain discrete quantiles)
# --------------------------------------------------------------------------
# Discrete (lower) percentiles from cumulative counts at VALUE grain —
# the x102/x144 device: never a per-row global sort. Rank targets are
# exact integers: r50 = (n+1)//2, r90 = ceil(0.9n) = (9n+9)//10; the
# percentile is the smallest lag whose cumulative count reaches the rank.

_SHIPLAG_ORACLE = """
WITH l AS (
  SELECT o.o_orderpriority AS pri,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(li.l_shipdate AS DATE)) AS BIGINT) AS lag
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
),
v AS (SELECT pri, lag, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY 1, 2),
cum AS (
  SELECT pri, lag, c,
         CAST(SUM(c) OVER (PARTITION BY pri ORDER BY lag
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY pri) AS BIGINT) AS n
  FROM v
)
SELECT pri AS o_orderpriority, MAX(n) AS n_lines,
       CAST(MIN(CASE WHEN cc >= (n + 1) // 2 THEN lag END) AS BIGINT)
         AS p50_days,
       CAST(MIN(CASE WHEN cc >= (9 * n + 9) // 10 THEN lag END) AS BIGINT)
         AS p90_days
FROM cum GROUP BY pri
"""


@register("orders_ship_lag_percentiles", oracle=_SHIPLAG_ORACLE)
def orders_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x210: FULFILMENT ship-lag percentiles per order priority — the
    order-to-ship SLA panel (does URGENT actually ship faster, and by how
    much at the tail?): integer day lags, p50/p90 as DISCRETE lower
    percentiles from cumulative counts at (priority, lag) value grain —
    no per-row sort, no interpolation, so the outputs are exact integers
    and engine-independent (module comment; the x102 device).

    100 TB: the fact join shuffles on orderkey once; everything after is
    |priorities|×|distinct lags| rows (lags are bounded integers — the
    value-grain table is tiny regardless of row count)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    l = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("lag"),
    )
    v = l.groupBy("pri", "lag").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_run = Window.partitionBy("pri").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("pri")
    cum = v.select(
        "pri",
        "lag",
        F.sum("c").over(w_run).cast("long").alias("cc"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    r50 = ((F.col("n") + 1) / 2).cast("long")
    r90 = ((9 * F.col("n") + 9) / 10).cast("long")
    return cum.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.max("n").alias("n_lines"),
        F.min(F.when(F.col("cc") >= r50, F.col("lag")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(F.col("cc") >= r90, F.col("lag")))
        .cast("long")
        .alias("p90_days"),
    )


# --------------------------------------------------------------------------
# x233 — count-min sketch as a first-class distributed aggregate
# --------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row (first md5 hex byte — uniform, no mod bias)

_CMS_ORACLE = f"""
WITH tc AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
),
expand AS (
  SELECT t.event_type, t.n, j.j,
         ('0x' || substring(md5('cms' || j.j || ':' || t.event_type), 1, 2))
           ::BIGINT AS bucket
  FROM tc t, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) j
),
cells AS (
  SELECT j, bucket, SUM(n) AS cell FROM expand GROUP BY j, bucket
)
SELECT e.event_type,
       CAST(MAX(e.n) AS BIGINT) AS true_count,
       CAST(MIN(c.cell) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cell) - MAX(e.n) AS BIGINT) AS overshoot
FROM expand e JOIN cells c ON c.j = e.j AND c.bucket = e.bucket
GROUP BY e.event_type
"""


@register("agg_countmin_estimate", oracle=_CMS_ORACLE)
def agg_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x233: COUNT-MIN SKETCH (Cormode-Muthukrishnan '05) spelled as
    DataFrame algebra — {_CMS_D} deterministic md5-derived hash rows x
    {_CMS_W} buckets, point estimate = min over rows of the landed cell,
    plus the per-key overshoot against truth (CMS never underestimates;
    overshoot quantifies collision error at this tiny width). Unlike a21's
    opaque HLL sketch bytes, THIS sketch is a (j, bucket, count) TABLE:
    mergeable by plain SUM across partitions/streams/days, inspectable,
    and hash-oracle-checkable cross-engine — the production shape for
    heavy-hitter pipelines that must audit their own sketch error.

    All-integer and deterministic: buckets are the first md5 hex byte
    (exactly 0..255 — no modulo bias), cells and estimates exact BIGINTs.

    100 TB: the value domain collapses FIRST (map-combined count per key),
    the sketch is built from (key, count) pairs — {_CMS_D}x|keys| rows, not
    {_CMS_D}x|events| — and the cell table is at most {_CMS_D}x{_CMS_W}
    rows regardless of corpus size. Estimating a key not in the pre-agg
    works by hashing it into the same cell table (broadcast lookup)."""
    ev = load_table(spark, sf_dir, "events")
    tc = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    expand = tc.select(
        "event_type",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms"), F.col("j"), F.lit(":"), F.col("event_type"))),
                1,
                2,
            ),
            16,
            10,
        ).cast("long"),
    )
    cells = expand.groupBy("j", "bucket").agg(F.sum("n").alias("cell"))
    return (
        expand.join(cells, ["j", "bucket"])
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("true_count"),
            F.min("cell").cast("long").alias("cms_estimate"),
            (F.min("cell") - F.max("n")).cast("long").alias("overshoot"),
        )
    )


# --------------------------------------------------------------------------
# x239 — Theil index: decomposable inequality (between + within groups)
# --------------------------------------------------------------------------

_THEIL_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS x_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
tot AS (
  SELECT SUM(x_cents) AS xt, COUNT(*) AS k,
         ROUND(CAST(SUM(x_cents) AS DOUBLE) / COUNT(*), 2) AS mu
  FROM rev
)
SELECT nation,
       x_cents,
       ROUND(CAST(x_cents AS DOUBLE) / (SELECT xt FROM tot), 6) AS share,
       CAST(ROUND(ROUND(CAST(x_cents AS DOUBLE) / (SELECT xt FROM tot), 6)
                  * ln(CAST(x_cents AS DOUBLE) / (SELECT mu FROM tot))
                  * 1000000) AS BIGINT) AS theil_term_u
FROM rev
"""


@register("agg_theil_index", oracle=_THEIL_ORACLE)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x239: THEIL T inequality index over per-nation revenue — the
    DECOMPOSABLE concentration measure x135's Gini is not: Theil terms
    s_i·ln(x_i/μ) sum to the population index, and a grouped version
    splits EXACTLY into between-group + within-group inequality, which is
    why cross-group fairness audits use it. Emits per-nation terms in
    integer micro-nats (Σ/1e6 = the index; 0 = perfect equality, ln(k) =
    one nation takes all).

    Determinism: revenue pinned to exact cents BIGINTs first; share pins
    6dp; μ pins 2dp; the ln() term rounds to micro-units immediately
    (x113's device — the corpus index is an exact integer sum under any
    partitioning and both libms).

    100 TB: the star join + agg collapses to |nations| rows before any
    epilogue; the totals ride an unpartitioned window over that dim-sized
    frame (pareto_abc's rule). A customer-grain Theil swaps the grain and
    keeps the same two-pass shape."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("x_cents")
        )
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    xt = F.sum("x_cents").over(w_all)
    mu = F.round(xt.cast("double") / F.count(F.lit(1)).over(w_all), 2)
    share = F.round(F.col("x_cents").cast("double") / xt, 6)
    return rev.select(
        "nation",
        "x_cents",
        share.alias("share"),
        F.round(share * F.log(F.col("x_cents").cast("double") / mu) * 1_000_000)
        .cast("long")
        .alias("theil_term_u"),
    )


# --------------------------------------------------------------------------
# x243 — Hill estimator: power-law tail index of order values
# --------------------------------------------------------------------------

_HILL_K = 100  # tail order statistics used

_HILL_ORACLE = f"""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC) AS r
  FROM v
),
kth AS (SELECT cents AS xk FROM ranked WHERE r = {_HILL_K + 1}),
tail AS (
  SELECT CAST(ROUND(ln(CAST(cents AS DOUBLE) / (SELECT xk FROM kth))
                    * 1000000) AS BIGINT) AS l_u
  FROM ranked WHERE r <= {_HILL_K}
)
SELECT CAST({_HILL_K} AS BIGINT) AS k,
       (SELECT CAST(xk AS BIGINT) FROM kth) AS xk_cents,
       CAST(SUM(l_u) AS BIGINT) AS sum_log_u,
       ROUND({_HILL_K} * 1000000.0 / SUM(l_u), 6) AS alpha_hill
FROM tail
"""


@register("agg_hill_tail_index", oracle=_HILL_ORACLE)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x243: HILL ESTIMATOR of the power-law tail index over order values
    — α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) on the top-k order statistics, THE
    standard heavy-tail exponent measurement (risk sizing, capacity
    head-room, "is this Pareto or lognormal" triage). Complements x161's
    Zipf slope (rank-frequency regression over vocab) with the
    order-statistics view over a continuous quantity; small α̂ = heavy
    tail = your p999 is not an outlier, it's the distribution.

    Determinism: exact-cents inputs; the k+1-st order statistic pins ties
    by value (duplicates are fine — ROW_NUMBER only selects the value);
    each log ratio rounds to integer micro-nats (x113), so the sum is
    exact and α̂ is one pinned division. k is a fixed constant, making
    the top-k a WindowGroupLimit, not a global sort.

    100 TB: top-(k+1) per partition then merge — Spark's rank-limit
    pushes the cap map-side; the tail frame is k rows regardless of
    corpus size. Choosing k: plot α̂ over a k-grid (this query with k
    parameterized) and read the stable plateau — the Hill plot."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    ranked = v.select(
        "cents",
        F.row_number().over(Window.orderBy(F.col("cents").desc())).alias("r"),
    ).filter(F.col("r") <= _HILL_K + 1)
    kth = ranked.filter(F.col("r") == _HILL_K + 1).select(
        F.col("cents").alias("xk")
    )
    tail = (
        ranked.filter(F.col("r") <= _HILL_K)
        .join(F.broadcast(kth))
        .select(
            F.round(
                F.log(F.col("cents").cast("double") / F.col("xk")) * 1_000_000
            )
            .cast("long")
            .alias("l_u"),
            "xk",
        )
    )
    return tail.groupBy().agg(
        F.lit(_HILL_K).cast("long").alias("k"),
        F.max("xk").cast("long").alias("xk_cents"),
        F.sum("l_u").cast("long").alias("sum_log_u"),
        F.round(_HILL_K * 1_000_000.0 / F.sum("l_u"), 6).alias("alpha_hill"),
    )


# --------------------------------------------------------------------------
# x244 — robust means: trimmed + winsorized per group (rank-exact)
# --------------------------------------------------------------------------

_TRIM_PCT = 5  # percent trimmed from EACH side

_TRIM_ORACLE = f"""
WITH pts AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS r,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
lim AS (
  SELECT *,
         (n * {_TRIM_PCT}) // 100 AS cut
  FROM pts
),
stats AS (
  SELECT flag,
         MAX(n) AS n_rows,
         MAX(cut) AS n_cut,
         SUM(CASE WHEN r > cut AND r <= n - cut THEN cents END) AS s_trim,
         SUM(CASE WHEN r > cut AND r <= n - cut THEN 1 ELSE 0 END) AS m_trim,
         MIN(CASE WHEN r = cut + 1 THEN cents END) AS lo_w,
         MIN(CASE WHEN r = n - cut THEN cents END) AS hi_w,
         SUM(CASE WHEN r <= cut OR r > n - cut THEN 1 ELSE 0 END) AS m_out
  FROM lim GROUP BY flag
)
SELECT flag,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_cut AS BIGINT) AS n_cut,
       ROUND(CAST(s_trim AS DOUBLE) / m_trim / 100, 6) AS trimmed_mean,
       ROUND((CAST(s_trim AS DOUBLE)
              + CAST(n_cut AS DOUBLE) * lo_w
              + CAST(n_cut AS DOUBLE) * hi_w) / n_rows / 100, 6)
         AS winsorized_mean
FROM stats
"""


@register("agg_trimmed_mean", oracle=_TRIM_ORACLE)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x244: ROBUST MEANS per group — the {_TRIM_PCT}%-trimmed mean (drop
    the extreme {_TRIM_PCT}% on each side, average the middle) and the
    winsorized mean (CLAMP the extremes to the cut values instead of
    dropping them) over line prices per return flag. The robust-location
    pair every metrics pipeline needs when p999 garbage pollutes plain
    AVG: trimming ignores outliers, winsorizing caps their leverage —
    x122 winsorizes VALUES (row transform); this produces the robust
    STATISTICS directly from rank arithmetic, one pass, no value rewrite.

    Exactness: cents integers; ranks pin ties by (price, orderkey,
    linenumber); cut = floor(n·{_TRIM_PCT}/100) in integer math; sums of
    the kept band and the two boundary order statistics are exact, so
    each mean is one pinned division chain.

    100 TB: one rank window per group (the same shuffle a percentile
    pays), then a map-combined conditional agg — no second pass over the
    data for the winsorized variant because the boundary values are
    picked up by rank equality inside the SAME agg."""
    li = load_table(spark, sf_dir, "lineitem")
    w_rank = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w_grp = Window.partitionBy("l_returnflag")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(w_grp).alias("n"),
    ).withColumn("cut", F.expr(f"(n * {_TRIM_PCT}) DIV 100"))
    kept = (F.col("r") > F.col("cut")) & (F.col("r") <= F.col("n") - F.col("cut"))
    stats = pts.groupBy("flag").agg(
        F.max("n").cast("long").alias("n_rows"),
        F.max("cut").cast("long").alias("n_cut"),
        F.sum(F.when(kept, F.col("cents"))).alias("s_trim"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("m_trim"),
        F.min(F.when(F.col("r") == F.col("cut") + 1, F.col("cents"))).alias("lo_w"),
        F.min(F.when(F.col("r") == F.col("n") - F.col("cut"), F.col("cents"))).alias(
            "hi_w"
        ),
    )
    return stats.select(
        "flag",
        "n_rows",
        "n_cut",
        F.round(F.col("s_trim").cast("double") / F.col("m_trim") / 100, 6).alias(
            "trimmed_mean"
        ),
        F.round(
            (
                F.col("s_trim").cast("double")
                + F.col("n_cut").cast("double") * F.col("lo_w")
                + F.col("n_cut").cast("double") * F.col("hi_w")
            )
            / F.col("n_rows")
            / 100,
            6,
        ).alias("winsorized_mean"),
    )


# --------------------------------------------------------------------------
# x248 — Poisson bootstrap CI (one-pass distributed resampling)
# --------------------------------------------------------------------------

_BOOT_B = 100  # bootstrap replicates

# Poisson(1) inverse-CDF thresholds, pinned 6dp (trap #18): the Poisson
# bootstrap replaces multinomial resampling with independent per-row
# Poisson(1) weights — THE one-pass distributed bootstrap (no global n
# needed, no second scan). One Python-generated table feeds both engines.
import math as _math  # noqa: E402

_POIS1_CDF = []
_acc = 0.0
for _k in range(7):
    _acc += _math.exp(-1) / _math.factorial(_k)
    _POIS1_CDF.append(round(_acc, 6))

# Fixed-width lowercase hex compares ORDER-ISOMORPHIC to the integer value,
# so the inverse-CDF ladder can run on the md5 substring DIRECTLY — no
# conv(hex,16,10) string->int parse in the 100x hot path. Thresholds are
# the same pinned CDF, pre-scaled to 2^32 and hex-printed once.
_POIS1_HEX = [format(int(c * 4294967296), "08x") for c in _POIS1_CDF]

_POIS_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN hx < '{h}' THEN {k}" for k, h in enumerate(_POIS1_HEX))
    + " ELSE 7 END"
)

_BOOT_ORACLE = f"""
WITH v AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
expl AS (
  -- one md5 per (row, replicate-GROUP): a 32-hex digest yields FOUR
  -- independent 8-hex uniforms, so 25 hashes serve 100 replicates
  -- (b = 4*g + o) — the hash is the hot path at 100x row expansion
  SELECT cents, 4 * g.g + o.o AS b,
         substring(md5('boot:' || event_id || ':' || g.g),
                   1 + 8 * o.o, 8) AS hx
  FROM v,
       (SELECT unnest(generate_series(0, {_BOOT_B // 4 - 1})) AS g) g,
       (SELECT unnest(generate_series(0, 3)) AS o) o
),
wtd AS (SELECT b, cents, {_POIS_CASE_SQL} AS w FROM expl),
reps AS (
  SELECT b,
         CAST(ROUND(CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100 * 1000000)
              AS BIGINT) AS mean_u
  FROM wtd GROUP BY b
),
ranked AS (
  SELECT mean_u, ROW_NUMBER() OVER (ORDER BY mean_u) AS r FROM reps
),
base AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6) AS mean_full
  FROM v
),
bs AS (
  SELECT
    (SELECT CAST(n AS BIGINT) FROM base) AS n,
    (SELECT mean_full FROM base) AS mean_full,
    ROUND((SELECT mean_u FROM ranked WHERE r = 3) / 1000000.0, 6) AS ci_lo,
    ROUND((SELECT mean_u FROM ranked WHERE r = 98) / 1000000.0, 6) AS ci_hi,
    (SELECT COUNT(*) FROM reps) AS n_reps,
    (SELECT ROUND(SQRT((CAST(SUM(CAST(mean_u AS DOUBLE) * mean_u) AS DOUBLE)
                        - CAST(SUM(CAST(mean_u AS DOUBLE)) AS DOUBLE)
                          * SUM(CAST(mean_u AS DOUBLE)) / COUNT(*))
                       / (COUNT(*) - 1)) / 1000000, 6)
       FROM reps) AS se_boot
)
SELECT n, mean_full, ci_lo, ci_hi, CAST(n_reps AS BIGINT) AS n_reps, se_boot
FROM bs
"""


@register("agg_bootstrap_ci", oracle=_BOOT_ORACLE)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x248: POISSON BOOTSTRAP confidence interval for the mean event
    value — the one-pass distributed bootstrap (Chamandy et al.'s
    production formulation at web scale): instead of resampling n rows
    WITH replacement (needs global coordination), every row independently
    receives a Poisson(1) weight per replicate, which converges to the
    same resampling distribution and needs NOTHING but a map + per-
    replicate partial aggregation. Emits the full-data mean, the 2.5/97.5
    rank-based percentile bounds over {_BOOT_B} replicate means, and the
    bootstrap SE — the assumption-free uncertainty the x158 median CI and
    x211 Wilson device cover only for their specific statistics.

    Determinism: weights come from a pinned Poisson(1) inverse-CDF table
    (Python-generated 6dp literals, both engines) applied to md5-derived
    uniforms per (row, replicate); replicate means pin to integer
    micro-units BEFORE ranking and variance, so the CI bounds and SE are
    exact-integer-order statistics and one correctly-rounded sqrt.

    100 TB: the {_BOOT_B}x row expansion is map-local and collapses to
    {_BOOT_B} partial sums per partition before the shuffle — the whole
    bootstrap costs one extra narrow pass over the scan, which is exactly
    why this formulation displaced driver-side resampling."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
    # one md5 per (row, replicate-group); 4 uniforms per digest (see oracle)
    expl = (
        v.select(
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B // 4 - 1))).alias("g"),
            "event_id",
        )
        .withColumn(
            "h",
            F.md5(F.concat(F.lit("boot:"), F.col("event_id"), F.lit(":"), F.col("g"))),
        )
        .select(
            "cents",
            "g",
            F.posexplode(
                F.array(*[F.substring("h", 1 + 8 * o, 8) for o in range(4)])
            ).alias("o", "hx"),
        )
        .select(
            "cents",
            (F.col("g") * 4 + F.col("o")).alias("b"),
            "hx",
        )
    )
    w = F.lit(7)
    for k in range(len(_POIS1_HEX) - 1, -1, -1):
        w = F.when(F.col("hx") < _POIS1_HEX[k], k).otherwise(w)
    reps = (
        expl.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w")
                / 100
                * 1_000_000
            )
            .cast("long")
            .alias("mean_u")
        )
    )
    ranked = reps.select(
        "mean_u", F.row_number().over(Window.orderBy("mean_u")).alias("r")
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stats = ranked.select(
        F.min(F.when(F.col("r") == 3, F.col("mean_u"))).over(w_all).alias("lo_u"),
        F.min(F.when(F.col("r") == 98, F.col("mean_u"))).over(w_all).alias("hi_u"),
        F.count(F.lit(1)).over(w_all).alias("n_reps"),
        F.sum(F.col("mean_u").cast("double")).over(w_all).alias("s1"),
        F.sum(F.col("mean_u").cast("double") * F.col("mean_u")).over(w_all).alias("s2"),
    ).limit(1)
    base = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)) / 100, 6).alias(
            "mean_full"
        ),
    )
    return base.join(F.broadcast(stats)).select(
        "n",
        "mean_full",
        F.round(F.col("lo_u") / 1_000_000.0, 6).alias("ci_lo"),
        F.round(F.col("hi_u") / 1_000_000.0, 6).alias("ci_hi"),
        F.col("n_reps").cast("long").alias("n_reps"),
        F.round(
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_reps"))
                / (F.col("n_reps") - 1)
            )
            / 1_000_000,
            6,
        ).alias("se_boot"),
    )


# --------------------------------------------------------------------------
# x258 — Value-at-Risk and expected shortfall (CVaR) per segment
# --------------------------------------------------------------------------

_VAR_Q = 0.95

_VAR_ORACLE = f"""
WITH pts AS (
  SELECT o_orderpriority AS seg,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
lim AS (
  SELECT *, CAST(ceil(n * {_VAR_Q}) AS BIGINT) AS r_var FROM pts
)
SELECT seg,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN r = r_var THEN cents END) AS BIGINT) AS var_cents,
       CAST(SUM(CASE WHEN r > r_var THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tail,
       ROUND(CAST(SUM(CASE WHEN r > r_var THEN cents END) AS DOUBLE)
             / SUM(CASE WHEN r > r_var THEN 1 ELSE 0 END) / 100, 6)
         AS cvar
FROM lim GROUP BY seg
"""


@register("agg_var_cvar", oracle=_VAR_ORACLE)
def agg_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x258: VALUE-AT-RISK and EXPECTED SHORTFALL (CVaR) at the
    {_VAR_Q:.0%} level per order priority — the finance risk pair: VaR is
    the {_VAR_Q:.0%} order statistic ("losses exceed this 1 day in 20"),
    CVaR the MEAN of everything beyond it — the coherent tail measure
    regulators moved to precisely because VaR ignores how bad the tail
    is. The tail-risk complement of x243's Hill exponent (which says how
    FAST the tail decays; this prices its first moment). Rank-discrete
    VaR (x106's device: the ceil(q·n)-th order statistic, ties pinned by
    orderkey) so no interpolation ever touches float.

    All-integer until the one CVaR division; the boundary order statistic
    and the tail membership come from rank equality inside the same agg
    (x244's no-second-pass trick).

    100 TB: one rank window per segment (the percentile shuffle) + a
    map-combined conditional agg. At extreme cardinality swap the exact
    rank for x184's GK-sketch quantile and take the tail mean over the
    sketch cutoff — same report, bounded state."""
    orders = load_table(spark, sf_dir, "orders")
    # r15 (guide §2.3, the x106 device): alias BEFORE the window — the
    # rank exchange carries (seg, tp, ok) instead of the aliased+original
    # 5-column pair, and cents derives from tp AFTER the shuffle. Ranking
    # still orders by the raw totalprice, so row selection is unchanged.
    # Interleaved 5-shot medians 0.55 -> 0.51 s at sf0.1.
    base = orders.select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").alias("tp"),
        F.col("o_orderkey").alias("ok"),
    )
    w_rank = Window.partitionBy("seg").orderBy("tp", "ok")
    w_seg = Window.partitionBy("seg")
    pts = base.select(
        "seg",
        F.round(F.col("tp") * 100).cast("long").alias("cents"),
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(w_seg).alias("n"),
    ).withColumn("r_var", F.ceil(F.col("n") * _VAR_Q).cast("long"))
    tail = F.col("r") > F.col("r_var")
    return pts.groupBy("seg").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.min(F.when(F.col("r") == F.col("r_var"), F.col("cents")))
        .cast("long")
        .alias("var_cents"),
        F.sum(F.when(tail, 1).otherwise(0)).cast("long").alias("n_tail"),
        F.round(
            F.sum(F.when(tail, F.col("cents"))).cast("double")
            / F.sum(F.when(tail, 1).otherwise(0))
            / 100,
            6,
        ).alias("cvar"),
    )


# --------------------------------------------------------------------------
# x259 — two-sample Kolmogorov-Smirnov drift test (exact integer D)
# --------------------------------------------------------------------------

_KS_ORACLE = """
WITH pts AS (
  SELECT event_type,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS period,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
cnt AS (
  SELECT event_type, cents,
         SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS d2
  FROM pts GROUP BY event_type, cents
),
ecdf AS (
  SELECT event_type, cents,
         SUM(d1) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(d2) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS c2,
         SUM(d1) OVER (PARTITION BY event_type) AS n1,
         SUM(d2) OVER (PARTITION BY event_type) AS n2
  FROM cnt
),
stat AS (
  SELECT event_type, MAX(n1) AS n1, MAX(n2) AS n2,
         MAX(ABS(c1 * n2 - c2 * n1)) AS d_num
  FROM ecdf GROUP BY event_type
)
SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(d_num AS BIGINT) AS d_num,
       ROUND(CAST(d_num AS DOUBLE) / (n1 * n2), 6) AS ks_d,
       ROUND((CAST(d_num AS DOUBLE) / (n1 * n2))
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6) AS ks_lambda,
       ROUND(2 * exp(-2 * ((CAST(d_num AS DOUBLE) / (n1 * n2))
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
             * ((CAST(d_num AS DOUBLE) / (n1 * n2))
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_one_term
FROM stat
"""


@register("agg_ks_twosample", oracle=_KS_ORACLE)
def agg_ks_twosample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x259: TWO-SAMPLE KOLMOGOROV-SMIRNOV test per event type — first
    half-month values vs second, the distribution-free "did the whole
    SHAPE shift?" companion to x230's binned PSI (KS needs no bin grid
    and is sensitive to any ECDF gap; PSI localizes WHERE mass moved).
    D is computed EXACTLY as an integer: at each distinct value,
    |c1·n2 − c2·n1| (cross-multiplied ECDF gap, no division), maxed per
    type, divided once for display. The asymptotic one-term p-value
    2·exp(−2λ²) is the standard large-sample approximation (Smirnov);
    λ and p are display-pinned 6dp, exp's ≤1-ulp libm spread vanishing
    at that scale.

    100 TB: one (type, value) grain agg off one scan, two windows on the
    collapsed value-grain frame (|distinct values| rows, not row grain).
    The int64 cross-product c·n caps at ~3e18 near n≈1.7e9 per side per
    type; beyond that rescale to DECIMAL(38) or swap the exact ECDF for
    a KLL-sketch ECDF at fixed rank error — same max-gap epilogue."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(2).alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cnt = pts.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("d2"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    ecdf = cnt.select(
        "event_type",
        F.sum("d1").over(w_cum).alias("c1"),
        F.sum("d2").over(w_cum).alias("c2"),
        F.sum("d1").over(w_all).alias("n1"),
        F.sum("d2").over(w_all).alias("n2"),
    )
    stat = ecdf.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
        .cast("long")
        .alias("d_num"),
    )
    ks_d = F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))
    lam = ks_d * F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    )
    return stat.select(
        "event_type",
        "n1",
        "n2",
        "d_num",
        F.round(ks_d, 6).alias("ks_d"),
        F.round(lam, 6).alias("ks_lambda"),
        F.round(2 * F.exp(-2 * lam * lam), 6).alias("p_one_term"),
    )


# --------------------------------------------------------------------------
# x260 — Mann-Kendall trend test + rank-discrete Sen slope
# --------------------------------------------------------------------------

_US_PER_DAY_AGG = 86_400_000_000

_MK_ORACLE = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pr AS MATERIALIZED (
  SELECT a.event_type,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg,
         CAST(b.y - a.y AS DOUBLE) / (b.day - a.day) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.day > a.day
),
sstat AS (
  SELECT event_type, SUM(sg) AS s, COUNT(*) AS m FROM pr GROUP BY event_type
),
nn AS (
  SELECT event_type, COUNT(*) AS n FROM daily GROUP BY event_type
),
ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie18
  FROM (SELECT event_type, y, COUNT(*) AS t FROM daily GROUP BY event_type, y)
  GROUP BY event_type
),
sen AS (
  SELECT event_type, slope
  FROM (SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS m
        FROM pr)
  WHERE r = (m + 1) // 2
)
SELECT s.event_type, CAST(n.n AS BIGINT) AS n_days, CAST(s.s AS BIGINT) AS s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18 AS BIGINT) AS var18,
       ROUND(CASE WHEN s.s > 0 THEN (s.s - 1)
                  WHEN s.s < 0 THEN (s.s + 1) ELSE 0 END
             / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18) / 18.0),
             6) AS z_mk,
       ROUND(se.slope, 6) AS sen_slope
FROM sstat s
JOIN nn n ON n.event_type = s.event_type
JOIN ties t ON t.event_type = s.event_type
JOIN sen se ON se.event_type = s.event_type
"""


@register("agg_mann_kendall", oracle=_MK_ORACLE)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x260: MANN-KENDALL monotonic-trend test + SEN SLOPE per event
    type's daily series — the nonparametric trend pair every ops/climate
    dashboard uses when x62's z-scores assume too much: S counts
    concordant minus discordant day pairs (distribution-free), the
    tie-corrected variance normalizes it, and Sen's slope is the median
    pairwise slope — robust where OLS (x66) chases one outlier day.

    Determinism: S, the tie term, and 18·Var(S) are pure integers; Sen's
    slope is RANK-DISCRETE (the lower-median pairwise slope, ties broken
    by slope value only — IEEE division of integer counts by integer day
    gaps is correctly rounded, so the slope doubles are bit-identical
    cross-engine and sorting them agrees).

    100 TB: the pair grid is |days|² per type AT DAY GRAIN (30 days →
    435 pairs; a decade → 6.7M per type, still tiny next to the
    row-grain daily agg that feeds it) — the classic safe quadratic:
    collapse to series grain FIRST, then pair."""
    ev = load_table(spark, sf_dir, "events")
    # r15 (guide §2.4): daily feeds FOUR consumers (both pair-join sides,
    # nn, ties) and pr TWO (sstat, sen) — stats-driven, each re-derived
    # the corpus agg / the pair self-join. Both frames are bounded at any
    # corpus size (daily by |types| x calendar, pr by |days|²/2 per type
    # — the docstring's safe quadratic), so one eager pin each. Corpus
    # scans 4 -> 1; interleaved 5-shot medians 0.85 -> 0.80 s at sf0.1.
    # A broadcast hint on the pair join A/B'd as a wash — left stats-free.
    daily = (
        ev.select(
            "event_type",
            (F.col("ts_us") / _US_PER_DAY_AGG).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()
    )
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
    )
    pr = a.join(b, "et").filter(F.col("db") > F.col("da")).select(
        "et",
        F.when(F.col("yb") > F.col("ya"), 1)
        .when(F.col("yb") < F.col("ya"), -1)
        .otherwise(0)
        .alias("sg"),
        (
            (F.col("yb") - F.col("ya")).cast("double") / (F.col("db") - F.col("da"))
        ).alias("slope"),
    ).localCheckpoint()
    sstat = pr.groupBy("et").agg(F.sum("sg").alias("s"))
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie18")
        )
    )
    w_sen = Window.partitionBy("et").orderBy("slope")
    w_cnt = Window.partitionBy("et")
    sen = (
        pr.select(
            "et",
            "slope",
            F.row_number().over(w_sen).alias("r"),
            F.count(F.lit(1)).over(w_cnt).alias("m"),
        )
        .filter(F.col("r") == ((F.col("m") + 1) / 2).cast("long"))
        .select("et", "slope")
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie18")
    )
    z = F.when(
        F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var18 / 18.0)
    ).when(
        F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var18 / 18.0)
    ).otherwise(F.lit(0.0))
    return (
        sstat.join(nn, sstat.et == nn.event_type)
        .join(ties.withColumnRenamed("event_type", "et2"), F.col("et") == F.col("et2"))
        .join(sen.withColumnRenamed("et", "et3").withColumnRenamed("slope", "sen_s"),
              F.col("et") == F.col("et3"))
        .select(
            F.col("et").alias("event_type"),
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s_stat"),
            var18.cast("long").alias("var18"),
            F.round(z, 6).alias("z_mk"),
            F.round("sen_s", 6).alias("sen_slope"),
        )
    )


# --------------------------------------------------------------------------
# x261 — circular statistics of event hour-of-day (micro-unit trig table)
# --------------------------------------------------------------------------

# x229's device at period 24: one Python-generated micro-unit cos/sin table
# feeds BOTH engines as integer literals, so the resultant components are
# EXACT int64 sums; atan2/sqrt appear only in the pinned display epilogue.
_CIRC_TABLE = tuple(
    (
        h,
        round(_math.cos(2 * _math.pi * h / 24) * 1_000_000),
        round(_math.sin(2 * _math.pi * h / 24) * 1_000_000),
    )
    for h in range(24)
)
_CIRC_VALUES = ", ".join(f"({h}, {c}, {s})" for h, c, s in _CIRC_TABLE)

_CIRC_ORACLE = f"""
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
trig(h, cos_u, sin_u) AS (VALUES {_CIRC_VALUES}),
res AS (
  SELECT p.event_type, SUM(p.n) AS n,
         SUM(p.n * t.cos_u) AS c_u, SUM(p.n * t.sin_u) AS s_u
  FROM prof p JOIN trig t ON p.h = t.h
  GROUP BY p.event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(c_u AS BIGINT) AS c_u, CAST(s_u AS BIGINT) AS s_u,
       ROUND(sqrt(CAST(c_u AS DOUBLE) * c_u + CAST(s_u AS DOUBLE) * s_u)
             / (n * 1000000.0), 6) AS resultant_r,
       ROUND(1 - sqrt(CAST(c_u AS DOUBLE) * c_u + CAST(s_u AS DOUBLE) * s_u)
             / (n * 1000000.0), 6) AS circ_variance,
       ROUND(fmod(atan2(CAST(s_u AS DOUBLE), CAST(c_u AS DOUBLE))
                  / (2 * pi()) * 24 + 24, 24), 4) AS mean_hour
FROM res
"""


@register("agg_circular_hour", oracle=_CIRC_ORACLE)
def agg_circular_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x261: CIRCULAR MEAN + resultant length of event hour-of-day per
    type — the correct average for clock data, where the linear mean of
    {23h, 1h} is a nonsense noon and the circular mean is midnight.
    Resultant length R near 1 = sharply peaked daily habit, near 0 =
    uniform (bot-like) activity; circular variance 1−R is x185's
    regularity signal done properly on the circle.

    Determinism: hour counts hit x229's micro-unit trig table (integer
    literals shared by both engines), so C = Σ n_h·cos_u and S are EXACT
    int64 sums under any partitioning; sqrt is correctly-rounded IEEE,
    and atan2 (the one libm call) takes bit-identical integer-cast
    arguments on both engines with the result pinned to 4dp hours.

    100 TB: the only row-grain work is the (type, hour) agg (map-side
    combined, ≤ 24·|types| rows out); the trig join is a 24-row
    broadcast. Weekly rhythm = same table at period 168."""
    ev = load_table(spark, sf_dir, "events")
    prof = (
        ev.select("event_type", F.hour("ts").cast("int").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    trig = spark.createDataFrame(
        list(_CIRC_TABLE), schema="h int, cos_u long, sin_u long"
    )
    res = (
        prof.join(F.broadcast(trig), "h")
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("n") * F.col("cos_u")).alias("c_u"),
            F.sum(F.col("n") * F.col("sin_u")).alias("s_u"),
        )
    )
    mag = F.sqrt(
        F.col("c_u").cast("double") * F.col("c_u")
        + F.col("s_u").cast("double") * F.col("s_u")
    )
    r = mag / (F.col("n") * 1_000_000.0)
    hour = (
        F.atan2(F.col("s_u").cast("double"), F.col("c_u").cast("double"))
        / (2 * _math.pi)
        * 24
        + 24
    )
    return res.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("c_u").cast("long").alias("c_u"),
        F.col("s_u").cast("long").alias("s_u"),
        F.round(r, 6).alias("resultant_r"),
        F.round(1 - r, 6).alias("circ_variance"),
        F.round(hour % 24, 4).alias("mean_hour"),
    )


# --------------------------------------------------------------------------
# x262 — Pythagorean mean family (geometric / harmonic / quadratic)
# --------------------------------------------------------------------------

_MEANS_ORACLE = """
WITH pts AS (
  SELECT o_orderpriority AS seg,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
acc AS (
  SELECT seg, COUNT(*) AS n, SUM(cents) AS sc,
         SUM(CAST(ROUND(ln(cents) * 1000000) AS BIGINT)) AS sln_u,
         SUM(CAST(ROUND(1e15 / cents) AS BIGINT)) AS sinv_f,
         SUM(cents * cents) AS ssq
  FROM pts GROUP BY seg
)
SELECT seg, CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(sc AS DOUBLE) / n / 100, 6) AS mean_arith,
       ROUND(exp(CAST(sln_u AS DOUBLE) / (n * 1e6)) / 100, 4) AS mean_geom,
       ROUND(n * 1e15 / CAST(sinv_f AS DOUBLE) / 100, 4) AS mean_harm,
       ROUND(sqrt(CAST(ssq AS DOUBLE) / n) / 100, 4) AS mean_quad
FROM acc
"""


@register("agg_mean_family", oracle=_MEANS_ORACLE)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x262: the PYTHAGOREAN MEAN FAMILY per order priority — arithmetic,
    geometric (the right average for multiplicative quantities: growth
    factors, ratios), harmonic (the right one for rates: $/unit averaged
    over units), quadratic/RMS (the energy mean) — with the AM ≥ GM ≥ HM
    inequality as a built-in sanity invariant (property-tested).

    Determinism: x113's micro-unit device for every transcendental —
    each row's ln(cents) rounds to integer micro-nats and each 1/cents
    to integer femto-units BEFORE summation, so all four accumulators
    are exact integers under any order; the squared sum rides DECIMAL(38)
    (Spark) / HUGEINT (DuckDB) — cents² terms near 3.6e15 overflow an
    int64 accumulator past ~2500 rows, the x204 overflow lesson applied
    at registration time, not discovered at sf1. exp/sqrt touch only
    identical pinned operands in the 4dp display epilogue.

    100 TB: one map-combined agg, 5 output rows; nothing but the scan is
    row-grain."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    acc = pts.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.sum(F.round(F.log("cents") * 1_000_000).cast("long")).alias("sln_u"),
        F.sum(F.round(F.lit(1e15) / F.col("cents")).cast("long")).alias("sinv_f"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("ssq"),
    )
    return acc.select(
        "seg",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("sc").cast("double") / F.col("n") / 100, 6).alias("mean_arith"),
        F.round(
            F.exp(F.col("sln_u").cast("double") / (F.col("n") * 1e6)) / 100, 4
        ).alias("mean_geom"),
        F.round(
            F.col("n") * 1e15 / F.col("sinv_f").cast("double") / 100, 4
        ).alias("mean_harm"),
        F.round(
            F.sqrt(F.col("ssq").cast("double") / F.col("n")) / 100, 4
        ).alias("mean_quad"),
    )


# --------------------------------------------------------------------------
# x263 — Q-Q panel against the fitted normal (literal z-score table)
# --------------------------------------------------------------------------

# Theoretical normal quantiles come from Python's stdlib NormalDist at
# module import, shipped to BOTH engines as micro-unit literals — the
# pinned-literal discipline (x217/x229) instead of an in-SQL inverse-CDF
# approximation that would have to agree bit-for-bit across engines.
from statistics import NormalDist as _NormalDist  # noqa: E402

_QQ_PCTS = tuple(range(5, 100, 5))
_QQ_TABLE = tuple(
    (p, round(_NormalDist().inv_cdf(p / 100) * 1_000_000)) for p in _QQ_PCTS
)
_QQ_VALUES = ", ".join(f"({p}, {z})" for p, z in _QQ_TABLE)

_QQ_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
acc AS (
  SELECT COUNT(*) AS n, SUM(cents) AS sc, SUM(cents * cents) AS ssq FROM pts
),
ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS r FROM pts
),
zt(pct, z_u) AS (VALUES {_QQ_VALUES}),
obs AS (
  SELECT z.pct, z.z_u, rk.cents AS obs_cents
  FROM zt z JOIN acc a ON TRUE
  JOIN ranked rk ON rk.r = CAST(CEIL(z.pct / 100.0 * a.n) AS BIGINT)
)
SELECT o.pct,
       ROUND(o.z_u / 1e6, 6) AS z_theo,
       ROUND(o.obs_cents / 100.0, 2) AS q_obs,
       ROUND((CAST(a.sc AS DOUBLE) / a.n
              + o.z_u / 1e6
                * sqrt((CAST(a.ssq AS DOUBLE) - CAST(a.sc AS DOUBLE) * a.sc / a.n)
                       / (a.n - 1))) / 100, 2) AS q_theo
FROM obs o JOIN acc a ON TRUE
"""


@register("agg_qq_normal", oracle=_QQ_ORACLE)
def agg_qq_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x263: Q-Q PANEL of order totals against the fitted normal — the
    distribution-diagnostic table behind every "is it normal enough?"
    decision (t-tests, control charts, z-score fences): observed
    rank-discrete quantiles at 5%-steps vs μ̂ + z_p·σ̂. Heavy upper tail
    ⇒ q_obs pulls above q_theo at high percentiles — the visual cousin
    of x243's Hill tail index.

    Determinism: theoretical z_p are PYTHON-STDLIB NormalDist literals
    (micro-units) shared by both engines — no in-SQL inverse CDF to
    drift; observed quantiles are tie-pinned order statistics (x106);
    μ̂/σ̂ come from exact integer sums (cents² over DECIMAL/HUGEINT, the
    x204 overflow lesson) with sqrt in the 2dp epilogue only.

    100 TB: one rank window (the percentile shuffle) + a one-row moment
    agg broadcast onto 19 rows; swap the exact rank for x184's GK sketch
    at extreme n — same panel, bounded memory."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    acc = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("ssq"),
    )
    ranked = pts.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_orderkey")).alias("r"),
    )
    zt = spark.createDataFrame(list(_QQ_TABLE), schema="pct int, z_u long")
    obs = (
        F.broadcast(zt)
        .join(F.broadcast(acc))
        .join(
            ranked,
            F.col("r")
            == F.ceil(F.col("pct") / 100.0 * F.col("n")).cast("long"),
        )
    )
    sd = F.sqrt(
        (
            F.col("ssq").cast("double")
            - F.col("sc").cast("double") * F.col("sc") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    return obs.select(
        "pct",
        F.round(F.col("z_u") / 1e6, 6).alias("z_theo"),
        F.round(F.col("cents") / 100.0, 2).alias("q_obs"),
        F.round(
            (F.col("sc").cast("double") / F.col("n") + F.col("z_u") / 1e6 * sd)
            / 100,
            2,
        ).alias("q_theo"),
    )


# --------------------------------------------------------------------------
# x277 — Kendall tau-b between two daily series (exact integer C/D/ties)
# --------------------------------------------------------------------------

_TAU_A = "view"
_TAU_B = "purchase"

_TAU_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         COUNT(*) AS y
  FROM events WHERE event_type IN ('{_TAU_A}', '{_TAU_B}') GROUP BY 1, 2
),
joint AS (
  SELECT a.day, a.y AS x, b.y AS y
  FROM daily a JOIN daily b ON b.day = a.day
  WHERE a.event_type = '{_TAU_A}' AND b.event_type = '{_TAU_B}'
),
pr AS (
  SELECT CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN b.y = a.y AND b.x <> a.x THEN 1 ELSE 0 END AS tie_y,
         CASE WHEN b.x = a.x AND b.y = a.y THEN 1 ELSE 0 END AS tie_xy
  FROM joint a JOIN joint b ON b.day > a.day
)
SELECT CAST((SELECT COUNT(*) FROM joint) AS BIGINT) AS n_days,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       CAST(SUM(tie_x) AS BIGINT) AS ties_x,
       CAST(SUM(tie_y) AS BIGINT) AS ties_y,
       CAST(SUM(tie_xy) AS BIGINT) AS ties_xy,
       ROUND((SUM(conc) - SUM(disc))
             / sqrt(CAST((SUM(conc) + SUM(disc) + SUM(tie_x) + SUM(tie_xy))
                         AS DOUBLE)
                    * (SUM(conc) + SUM(disc) + SUM(tie_y) + SUM(tie_xy))),
             6) AS tau_b
FROM pr
"""


@register("corr_kendall_tau", oracle=_TAU_ORACLE)
def corr_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x277: KENDALL τ-b between the daily '{_TAU_A}' and '{_TAU_B}'
    series — the rank-concordance correlation that x195's Pearson matrix
    cannot give you when the relationship is monotone-but-nonlinear, and
    the natural companion of x260 (Mann-Kendall IS Kendall tau against
    time; this is tau against another series). Tie-corrected tau-b:
    (C−D)/√((n₀−Tx)(n₀−Ty)) with every count an exact integer off the
    bounded day-pair grid; the single sqrt is display epilogue.

    Note the identity n₀ = C+D+Tx+Ty+Txy per denominator leg, spelled as
    integer sums so both engines assemble the same operands.

    100 TB: x260's shape — collapse to day grain first, pair the
    |days|² grid (decade ≈ 6.7M pairs, trivial next to the row-grain
    agg). Row-scale Kendall (not series-grain) needs the O(n log n)
    merge-sort inversion count — noted, different op."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin(_TAU_A, _TAU_B))
        .select(
            "event_type",
            (F.col("ts_us") / _US_PER_DAY_AGG).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a = daily.filter(F.col("event_type") == _TAU_A).select(
        "day", F.col("y").alias("x")
    )
    b = daily.filter(F.col("event_type") == _TAU_B).select(
        "day", F.col("y").alias("y")
    )
    joint = a.join(b, "day")
    l = joint.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    r = joint.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pr = l.join(r, F.col("db") > F.col("da"))
    dx = F.col("xb") - F.col("xa")
    dy = F.col("yb") - F.col("ya")
    agg = pr.agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).alias("d"),
        F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0)).alias("tx"),
        F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0)).alias("ty"),
        F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0)).alias("txy"),
    )
    n = joint.agg(F.count(F.lit(1)).alias("n_days"))
    leg_x = (F.col("c") + F.col("d") + F.col("tx") + F.col("txy")).cast("double")
    leg_y = F.col("c") + F.col("d") + F.col("ty") + F.col("txy")
    return agg.join(F.broadcast(n)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.col("tx").cast("long").alias("ties_x"),
        F.col("ty").cast("long").alias("ties_y"),
        F.col("txy").cast("long").alias("ties_xy"),
        F.round(
            (F.col("c") - F.col("d")) / F.sqrt(leg_x * leg_y), 6
        ).alias("tau_b"),
    )


# --------------------------------------------------------------------------
# x278 — Spearman rank correlation (average-rank ties, doubled-rank ints)
# --------------------------------------------------------------------------

_SPEAR_ORACLE = """
WITH pts AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
  FROM lineitem
),
rk AS (
  -- doubled average ranks: 2*avg_rank = 2*min_rank + (t-1) is ALWAYS an
  -- integer (ties step by halves), so all moments stay exact
  SELECT CAST(2 * RANK() OVER (ORDER BY q) - 1
              + COUNT(*) OVER (PARTITION BY q) AS BIGINT) AS rx2,
         CAST(2 * RANK() OVER (ORDER BY p) - 1
              + COUNT(*) OVER (PARTITION BY p) AS BIGINT) AS ry2
  FROM pts
),
mom AS (
  SELECT COUNT(*) AS n, SUM(rx2) AS sx, SUM(ry2) AS sy,
         SUM(rx2 * rx2) AS sxx, SUM(ry2 * ry2) AS syy, SUM(rx2 * ry2) AS sxy
  FROM rk
)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS spearman_rho
FROM mom
"""


@register("corr_spearman", oracle=_SPEAR_ORACLE)
def corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x278: SPEARMAN rank correlation between line quantity and
    extended price — Pearson on ranks: monotone-association strength
    immune to the outliers and curvature that bend x195's raw-value
    correlations. Tie handling is the textbook AVERAGE rank, carried as
    DOUBLED ranks (2·avg = 2·min_rank + t − 1, always an integer since
    tied averages step by halves) so every moment is an exact integer
    sum and ρ is one pinned expression — the scale factor cancels.

    100 TB: two global rank windows are the cost (a percentile-class
    shuffle each, x106's rationale); at extreme n swap exact ranks for
    x184's GK sketch ranks at fixed rank error. Doubled-rank products
    reach ~4n³ — int64 holds to ~10⁶ rows, the DECIMAL(38) swap beyond
    (x195's overflow note; applies at sf1 already for lineitem — wired
    as DECIMAL here for exactly that reason)."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
    )
    rk = pts.select(
        (
            2 * F.rank().over(Window.orderBy("q"))
            - 1
            + F.count(F.lit(1)).over(Window.partitionBy("q"))
        ).alias("rx2"),
        (
            2 * F.rank().over(Window.orderBy("p"))
            - 1
            + F.count(F.lit(1)).over(Window.partitionBy("p"))
        ).alias("ry2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(dec("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(dec("ry2") * F.col("ry2")).alias("syy"),
        F.sum(dec("rx2") * F.col("ry2")).alias("sxy"),
    )
    return mom.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * (
                    F.col("n").cast("double") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# x286 — diversity/entropy family over each type's hourly profile
# --------------------------------------------------------------------------

_ENTFAM_ORACLE = """
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
acc AS (
  SELECT event_type, SUM(c) AS n, COUNT(*) AS k, SUM(c * c) AS sc2,
         SUM(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)) AS clnc_u
  FROM prof GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS k_hours,
       ROUND((ln(n) - clnc_u / (CAST(n AS DOUBLE) * 1e6)) / ln(24), 6)
         AS shannon_norm,
       ROUND(-ln(CAST(sc2 AS DOUBLE) / (CAST(n AS DOUBLE) * n)) / ln(24), 6)
         AS renyi2_norm,
       ROUND(1 - CAST(sc2 AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)
         AS gini_simpson,
       ROUND((CAST(n AS DOUBLE) * n) / sc2, 4) AS effective_hours
FROM acc
"""


@register("agg_entropy_family", oracle=_ENTFAM_ORACLE)
def agg_entropy_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x286: the DIVERSITY-INDEX FAMILY over each type's hour-of-day
    profile — normalized Shannon entropy (via the exact identity
    H = ln n − Σc·ln c / n, each c·ln c micro-nat pinned at count grain:
    x113's device where the ROUNDING happens on integer-argument logs),
    Rényi-2 collision entropy (−ln Σp², and Σp² = Σc²/n² is EXACT
    integer arithmetic — the only diversity index computable with zero
    transcendental exposure), Gini-Simpson 1−Σp², and Hill-number
    "effective hours" n²/Σc² — ecology's answer to "how many hours does
    this type effectively live in?". One family, one agg: x264 asks the
    same question of the SPECTRUM; this asks it of the raw profile.

    100 TB: one (type, hour) map-combined agg; everything else is
    |types| rows. Σc² caps int64 at ~3e9 events/hour-cell — DECIMAL
    swap noted past that."""
    ev = load_table(spark, sf_dir, "events")
    prof = (
        ev.select("event_type", F.hour("ts").cast("int").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    acc = prof.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        F.sum(
            F.round(F.col("c") * F.log("c") * 1_000_000).cast("long")
        ).alias("clnc_u"),
    )
    p2 = F.col("sc2").cast("double") / (F.col("n").cast("double") * F.col("n"))
    return acc.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("k_hours"),
        F.round(
            (F.log("n") - F.col("clnc_u") / (F.col("n").cast("double") * 1e6))
            / _math.log(24),
            6,
        ).alias("shannon_norm"),
        F.round(-F.log(p2) / _math.log(24), 6).alias("renyi2_norm"),
        F.round(1 - p2, 6).alias("gini_simpson"),
        F.round(1 / p2, 4).alias("effective_hours"),
    )


# --------------------------------------------------------------------------
# x287 — Jarque-Bera normality panel per event type (exact raw moments)
# --------------------------------------------------------------------------

_JB_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         SUM(CAST(cents AS HUGEINT) * cents) AS s2,
         SUM(CAST(cents AS HUGEINT) * cents * cents) AS s3,
         SUM(CAST(cents AS HUGEINT) * cents * cents * cents) AS s4
  FROM v GROUP BY event_type
),
e AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM m
),
c AS (
  SELECT event_type, n,
         r2 - mu * mu AS m2,
         r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
         r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu AS m4
  FROM e
),
s AS (
  SELECT event_type, n,
         ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness,
         ROUND(m4 / (m2 * m2) - 3, 6) AS kurt_excess
  FROM c
)
SELECT event_type, CAST(n AS BIGINT) AS n_rows, skewness, kurt_excess,
       ROUND(n * (skewness * skewness + kurt_excess * kurt_excess / 4) / 6, 4)
         AS jb_stat,
       CAST(CASE WHEN n * (skewness * skewness + kurt_excess * kurt_excess / 4)
                      / 6 > 5.991465
                 THEN 1 ELSE 0 END AS INTEGER) AS normal_reject
FROM s
"""


@register("agg_jarque_bera", oracle=_JB_ORACLE)
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x287: JARQUE-BERA normality panel per event type — skewness,
    excess kurtosis, and JB = n/6(S^2 + K^2/4) vs the pinned chi2(2) 95%
    critical value 5.991465: the moment-based test that tells you whether
    x62's z-score fences (which assume normal tails) are honest for this
    type's value distribution, from ONE pass of exact integer raw
    moments. The significance sibling of x134's descriptive moments.

    Exactness: cents-pinned values; S1 in BIGINT, S2-S4 in DECIMAL(38,0)
    / HUGEINT accumulators (cents^4 ~ 6e18 per row overflows int64 in the
    SUM at any realistic n — the price_index lesson applied up-moment).
    Both engines cast the SAME exact integer to double (correctly
    rounded, bit-identical) and run one identically-parenthesized central
    -moment epilogue; skew/kurt publish at 6dp and JB is assembled FROM
    the published values (x196's compose-from-published device).

    100 TB: one map-combined groupBy at |types| grain; the epilogue is
    |types| rows. DECIMAL(38) holds to ~1e19 rows of cents^4 partials."""
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(dec("cents") * F.col("cents")).alias("s2"),
        F.sum(dec("cents") * F.col("cents") * F.col("cents")).alias("s3"),
        F.sum(
            dec("cents") * F.col("cents") * F.col("cents") * F.col("cents")
        ).alias("s4"),
    )
    e = m.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        (F.col("s2").cast("double") / F.col("n")).alias("r2"),
        (F.col("s3").cast("double") / F.col("n")).alias("r3"),
        (F.col("s4").cast("double") / F.col("n")).alias("r4"),
    )
    mu = F.col("mu")
    c = e.select(
        "event_type",
        "n",
        (F.col("r2") - mu * mu).alias("m2"),
        (F.col("r3") - 3 * mu * F.col("r2") + 2 * mu * mu * mu).alias("m3"),
        (
            F.col("r4")
            - 4 * mu * F.col("r3")
            + 6 * mu * mu * F.col("r2")
            - 3 * mu * mu * mu * mu
        ).alias("m4"),
    )
    s = c.select(
        "event_type",
        "n",
        F.round(
            F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))), 6
        ).alias("skewness"),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3, 6).alias(
            "kurt_excess"
        ),
    )
    jb = (
        F.col("n")
        * (
            F.col("skewness") * F.col("skewness")
            + F.col("kurt_excess") * F.col("kurt_excess") / 4
        )
        / 6
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        "skewness",
        "kurt_excess",
        F.round(jb, 4).alias("jb_stat"),
        F.when(jb > 5.991465, 1).otherwise(0).cast("int").alias("normal_reject"),
    )


# --------------------------------------------------------------------------
# x288 — Cramér's V: event_type × weekday association (integer contingency)
# --------------------------------------------------------------------------

_CRAMV_ORACLE = """
WITH base AS (
  SELECT event_type,
         CAST(((CAST(epoch_us(ts) AS BIGINT) // 86400000000) + 4) % 7
              AS INTEGER) AS wd
  FROM events
),
cell AS (
  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY 1, 2
),
marg AS (
  SELECT event_type, wd, o,
         SUM(o) OVER (PARTITION BY event_type) AS r,
         SUM(o) OVER (PARTITION BY wd) AS c,
         SUM(o) OVER () AS n
  FROM cell
),
term AS (
  SELECT n,
         CAST(ROUND(
           CAST((CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
                * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
                AS DOUBLE)
           / (CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE)) * 1000000)
         AS BIGINT) AS t_u
  FROM marg
),
chi AS (
  SELECT MAX(n) AS n, ROUND(SUM(t_u) / 1e6, 6) AS chi2 FROM term GROUP BY n
)
SELECT CAST(n AS BIGINT) AS n_events, chi2, CAST(24 AS INTEGER) AS df,
       ROUND(sqrt(chi2 / (n * 4.0)), 6) AS cramers_v,
       CAST(CASE WHEN chi2 > 36.415029 THEN 1 ELSE 0 END AS INTEGER)
         AS indep_reject
FROM chi
"""


@register("corr_cramers_v", oracle=_CRAMV_ORACLE)
def corr_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x288: CRAMÉR'S V association between event_type and weekday — the
    bounded [0,1] EFFECT-SIZE companion to x223's mutual information
    (bits answer "how much structure"; V answers "how strong vs the
    maximum possible"), via chi2 = Σ (N·O − r·c)^2 / (N·r·c) on the 5×7
    contingency grid and V = sqrt(chi2 / (N·min(r−1,c−1))).

    Weekday is pure integer arithmetic on the epoch day ((day+4) mod 7,
    1970-01-01 = Thursday) — no engine calendar/locale surface (the
    fn_datepart lesson). Each cell's numerator (N·O − r·c)^2 runs in
    HUGEINT/DECIMAL(38) (N·O ~ 3e10 at sf1 squares past int64); the
    per-cell float term is micro-unit pinned (x113) so the 35-cell sum
    is an exact integer — zero summation-order exposure. chi2 publishes
    at 6dp; V composes FROM the published chi2 (x196's device). The
    reject flag compares to the pinned chi2(24) 95% value 36.415029.

    100 TB: one map-combined (type, weekday) agg; every window after it
    runs on the 35-row grid. DECIMAL swap for r·c noted past ~1e9 rows
    per margin."""
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    base = ev.select(
        "event_type",
        (((F.col("ts_us") / 86_400_000_000).cast("long") + 4) % 7)
        .cast("int")
        .alias("wd"),
    )
    cell = base.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    marg = cell.select(
        "event_type",
        "wd",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("wd")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    d = dec("n") * F.col("o") - dec("r") * F.col("c")
    term = marg.select(
        "n",
        F.round(
            (d * d).cast("double")
            / (dec("n") * F.col("r") * F.col("c")).cast("double")
            * 1_000_000
        )
        .cast("long")
        .alias("t_u"),
    )
    chi = term.groupBy("n").agg(
        F.round(F.sum("t_u") / 1e6, 6).alias("chi2")
    )
    return chi.select(
        F.col("n").cast("long").alias("n_events"),
        "chi2",
        F.lit(24).cast("int").alias("df"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n") * 4.0)), 6).alias(
            "cramers_v"
        ),
        F.when(F.col("chi2") > 36.415029, 1)
        .otherwise(0)
        .cast("int")
        .alias("indep_reject"),
    )


# --------------------------------------------------------------------------
# x289 — Brown-Forsythe robust variance-equality test across event types
# --------------------------------------------------------------------------

_LEVENE_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
rk AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type, MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med
  FROM rk GROUP BY event_type
),
z AS (
  SELECT v.event_type, ABS(v.cents - m.med) AS z
  FROM v JOIN med m ON v.event_type = m.event_type
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(z) AS BIGINT) AS tg,
         SUM(CAST(z AS HUGEINT) * z) AS sg2
  FROM z GROUP BY event_type
),
q AS (
  SELECT ng, tg, sg2,
         CAST(ROUND(CAST(CAST(tg AS HUGEINT) * tg AS DOUBLE) / ng * 100)
              AS BIGINT) AS qg_u
  FROM g
),
tot AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(tg) AS BIGINT) AS t,
         CAST(SUM(sg2) AS DOUBLE) AS s2,
         CAST(SUM(qg_u) AS BIGINT) AS q_u
  FROM q
),
e AS (
  SELECT n, k,
         q_u / 1e2 - (CAST(t AS DOUBLE) / n) * t AS ssb,
         s2 - q_u / 1e2 AS ssw
  FROM tot
)
SELECT (SELECT n FROM tot) AS n_rows, (SELECT k FROM tot) AS k_groups,
       CAST((SELECT k FROM tot) - 1 AS BIGINT) AS df1,
       CAST((SELECT n FROM tot) - (SELECT k FROM tot) AS BIGINT) AS df2,
       ROUND((ssb / ((SELECT k FROM tot) - 1))
             / (ssw / ((SELECT n FROM tot) - (SELECT k FROM tot))), 6)
         AS f_stat,
       CAST(CASE WHEN (ssb / ((SELECT k FROM tot) - 1))
                      / (ssw / ((SELECT n FROM tot) - (SELECT k FROM tot)))
                      > 2.372 THEN 1 ELSE 0 END AS INTEGER) AS var_hetero
FROM e
"""


@register("agg_levene_bf", oracle=_LEVENE_ORACLE)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x289: BROWN-FORSYTHE test (Levene's test with group MEDIANS) for
    variance equality across event types — the gate before any pooled-
    variance readout (x126's Welch sidesteps it per-pair; this answers
    it once for all k groups, robustly: median centers are immune to the
    heavy tails that break classical Levene-with-means). One-way ANOVA F
    on z = |cents − group-median|.

    Exactness: rank-discrete LOWER median per group (x129's device — an
    actual data value, never an interpolated float), deviations z exact
    integer cents, per-group Σz and Σz² exact (HUGEINT second moments),
    and the only rational per-group quantity tg²/ng centi-unit pinned
    (x113 at 1e2 grain — value ~5e12 at sf1 keeps the int64 sum safe)
    so SSB/SSW assemble from exact integers in one identically-
    parenthesized epilogue. Flag vs the pinned F(4,∞)=chi2(4)/4 95%
    value 2.372 (df2 ~ N makes the asymptote honest).

    100 TB: one per-(type,cents) rank pass for medians (cents domain is
    small — swap for count-grain midrank rollup past ~1e9 distinct), one
    map-combined 3-moment agg, then a k-row epilogue."""
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    # r15 (guide §2.5; the x330/x298 value-grain device — same events value
    # domain, grid-bounded support at any corpus size): median and the
    # |z| moments now run on the (type, cents) HISTOGRAM — the old form
    # sorted each type's entire corpus through one row_number window task
    # and re-scanned the corpus for the z pass. sum(z) over rows ≡
    # sum(z·t) over values and count ≡ sum(t) in exact integers, so every
    # downstream value is identical. No eager pin: ReuseExchange shares
    # the histogram exchange between the median and z consumers (A/B'd —
    # the pin was a wash). Head-to-head interleaved medians vs the
    # row-grain form: 0.688 -> 0.725 s, a ~5% LOCAL regression kept
    # deliberately for the single-task-sort wall + second corpus scan it
    # removes (the agg_mood_median r14 adjudication accepted the same
    # trade; the earlier 0.90 -> 0.78 reading was cross-window drift).
    hist = v.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    w_t = Window.partitionBy("event_type")
    wcum = w_t.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = hist.select(
        "event_type",
        "cents",
        "t",
        F.sum("t").over(wcum).alias("cum"),
        F.sum("t").over(w_t).alias("n"),
    )
    med = c.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2), F.col("cents")
            )
        ).alias("med")
    )
    z = hist.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("med")).alias("z"),
        "t",
    )
    g = z.groupBy("event_type").agg(
        F.sum("t").cast("long").alias("ng"),
        F.sum(F.col("z") * F.col("t")).alias("tg"),
        F.sum(dec("z") * F.col("z") * F.col("t")).alias("sg2"),
    )
    q = g.select(
        "ng",
        "tg",
        "sg2",
        F.round(
            (dec("tg") * F.col("tg")).cast("double") / F.col("ng") * 100
        )
        .cast("long")
        .alias("qg_u"),
    )
    tot = q.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("tg").cast("long").alias("t"),
        F.sum("sg2").cast("double").alias("s2"),
        F.sum("qg_u").cast("long").alias("q_u"),
    )
    e = tot.select(
        "n",
        "k",
        (
            F.col("q_u") / 1e2
            - (F.col("t").cast("double") / F.col("n")) * F.col("t")
        ).alias("ssb"),
        (F.col("s2") - F.col("q_u") / 1e2).alias("ssw"),
    )
    f = (F.col("ssb") / (F.col("k") - 1)) / (
        F.col("ssw") / (F.col("n") - F.col("k"))
    )
    return e.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(f, 6).alias("f_stat"),
        F.when(f > 2.372, 1).otherwise(0).cast("int").alias("var_hetero"),
    )


# --------------------------------------------------------------------------
# x296 — iterative proportional fitting (raking) to uniform margins
# --------------------------------------------------------------------------

_IPF_ROUNDS = 3

def _ipf_round_sql(t: int) -> str:
    """One IPF iteration (row scale then column scale) as two chained
    CTEs over integer micro-unit weights. ``r{t}``/``c{t}`` naming."""
    prev = "w0" if t == 1 else f"c{t - 1}"
    return f"""
r{t} AS (
  SELECT event_type, wd, o, n,
         CAST(ROUND(CAST(w_u AS DOUBLE)
              * ((CAST(n AS DOUBLE) * 200000) /
                 CAST(SUM(w_u) OVER (PARTITION BY event_type) AS DOUBLE)))
              AS BIGINT) AS w_u
  FROM {prev}
),
c{t} AS (
  SELECT event_type, wd, o, n,
         CAST(ROUND(CAST(w_u AS DOUBLE)
              * ((CAST(n AS DOUBLE) * 1000000 / 7) /
                 CAST(SUM(w_u) OVER (PARTITION BY wd) AS DOUBLE)))
              AS BIGINT) AS w_u
  FROM r{t}
)"""


_IPF_ORACLE = f"""
WITH base AS (
  SELECT event_type,
         CAST(((CAST(epoch_us(ts) AS BIGINT) // 86400000000) + 4) % 7
              AS INTEGER) AS wd
  FROM events
),
cell AS (
  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY 1, 2
),
w0 AS (
  SELECT event_type, wd, o, SUM(o) OVER () AS n, o * 1000000 AS w_u FROM cell
),
{",".join(_ipf_round_sql(t) for t in range(1, _IPF_ROUNDS + 1))}
SELECT event_type, wd, o AS n_obs,
       ROUND(w_u / 1e6, 6) AS w_raked,
       ROUND(CAST(w_u AS DOUBLE) / (CAST(o AS DOUBLE) * 1000000), 6)
         AS rake_factor
FROM c{_IPF_ROUNDS}
"""


@register("agg_ipf_raking", oracle=_IPF_ORACLE)
def agg_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x296: ITERATIVE PROPORTIONAL FITTING (raking, Deming-Stephan) of
    the event_type × weekday contingency table to UNIFORM margins — the
    survey-weighting workhorse: after 3 row/column scaling rounds every
    type carries N/5 and every weekday N/7 of the total weight, and the
    per-cell rake_factor is the reweight a debiasing pipeline applies
    (x209's temperature sampling asks "what to draw"; this asks "what
    to count each draw as"). x288 measures the dependence; this removes
    it.

    Determinism: weights live as INTEGER MICRO-UNITS between scalings —
    margin sums are exact integer window sums (zero summation-order
    exposure), each scaling is one identically-parenthesized double
    ratio (row target N·200000 micro-units is exact; the /7 column
    literal parses to the same double in both engines) re-pinned to
    integers by half-away ROUND. Fixed 3 iterations = 6 scalings,
    unrolled as chained CTEs vs chained selects — no driver loop.

    100 TB: one map-combined (type, wd) agg; all 6 scalings run on the
    35-row grid. Margins past ~9e12 events switch w_u to DECIMAL(38)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (((F.col("ts_us") / 86_400_000_000).cast("long") + 4) % 7)
        .cast("int")
        .alias("wd"),
    )
    cell = base.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    cur = cell.select(
        "event_type",
        "wd",
        "o",
        F.sum("o").over(Window.partitionBy()).alias("n"),
        (F.col("o") * 1_000_000).alias("w_u"),
    )
    for _ in range(_IPF_ROUNDS):
        cur = cur.select(
            "event_type",
            "wd",
            "o",
            "n",
            F.round(
                F.col("w_u").cast("double")
                * (
                    (F.col("n").cast("double") * 200000)
                    / F.sum("w_u")
                    .over(Window.partitionBy("event_type"))
                    .cast("double")
                )
            )
            .cast("long")
            .alias("w_u"),
        )
        cur = cur.select(
            "event_type",
            "wd",
            "o",
            "n",
            F.round(
                F.col("w_u").cast("double")
                * (
                    (F.col("n").cast("double") * 1000000 / 7)
                    / F.sum("w_u").over(Window.partitionBy("wd")).cast("double")
                )
            )
            .cast("long")
            .alias("w_u"),
        )
    return cur.select(
        "event_type",
        "wd",
        F.col("o").alias("n_obs"),
        F.round(F.col("w_u") / 1e6, 6).alias("w_raked"),
        F.round(
            F.col("w_u").cast("double") / (F.col("o").cast("double") * 1000000),
            6,
        ).alias("rake_factor"),
    )


# --------------------------------------------------------------------------
# x297 — Welch's unequal-variance t-test (purchase vs click values)
# --------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'click')
),
g AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS n1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS n2,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
      AS BIGINT) AS t1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
      AS BIGINT) AS t2,
    SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(cents AS DECIMAL(38, 0)) * cents ELSE 0 END) AS s1,
    SUM(CASE WHEN event_type = 'click'
             THEN CAST(cents AS DECIMAL(38, 0)) * cents ELSE 0 END) AS s2
  FROM v
),
m AS (
  SELECT n1, n2,
         CAST(t1 AS DOUBLE) / n1 - CAST(t2 AS DOUBLE) / n2 AS md,
         (CAST(s1 AS DOUBLE) - CAST(t1 AS DOUBLE) / n1 * t1) / (n1 - 1) / n1
           AS se1,
         (CAST(s2 AS DOUBLE) - CAST(t2 AS DOUBLE) / n2 * t2) / (n2 - 1) / n2
           AS se2
  FROM g
)
SELECT n1 AS n_purchase, n2 AS n_click,
       ROUND(md, 6) AS mean_diff_cents,
       ROUND(md / sqrt(se1 + se2), 6) AS t_stat,
       ROUND((se1 + se2) * (se1 + se2)
             / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 6) AS df_welch,
       CAST(CASE WHEN abs(md / sqrt(se1 + se2)) > 1.959964 THEN 1 ELSE 0 END
            AS INTEGER) AS mean_differs
FROM m
"""


@register("agg_welch_ttest", oracle=_WELCH_ORACLE)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x297: WELCH'S UNEQUAL-VARIANCE t-TEST, purchase vs click values —
    the two-sample mean test that does NOT assume equal variances (which
    x289's Brown-Forsythe just showed can fail): Satterthwaite df, large
    -sample reject vs the pinned z 1.959964 (df ~ thousands makes the
    normal asymptote honest; the literal keeps the flag integer-sided).
    Complements x144 (rank test, no moments) and x126 (z on conversion
    rates): this one reads cents directly.

    Exactness: per-group moments are exact integers (S1 BIGINT, S2
    DECIMAL(38) — cents² sums overflow int64 by sf1); mean diff, the
    two standard-error components, t, and df are ONE identically-
    parenthesized double epilogue on a 1-row frame. The reject flag
    compares the UNROUNDED |t| against the literal so no published-
    value straddle exists (x294's device).

    100 TB: a single map-combined conditional-sum aggregate over the
    filtered scan (predicate pushdown on event_type) → 1 row. Nothing
    shuffles but partial aggregates."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    is_p = F.col("event_type") == "purchase"
    cdec = F.col("cents").cast("decimal(38,0)")
    g = v.agg(
        F.sum(F.when(is_p, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~is_p, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is_p, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("t1"),
        F.sum(F.when(~is_p, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("t2"),
        F.sum(F.when(is_p, cdec * F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(F.when(~is_p, cdec * F.col("cents")).otherwise(0)).alias("s2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    md = F.col("t1").cast("double") / n1 - F.col("t2").cast("double") / n2
    se1 = (
        (F.col("s1").cast("double") - F.col("t1").cast("double") / n1 * F.col("t1"))
        / (n1 - 1)
        / n1
    )
    se2 = (
        (F.col("s2").cast("double") - F.col("t2").cast("double") / n2 * F.col("t2"))
        / (n2 - 1)
        / n2
    )
    t = md / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return g.select(
        n1.alias("n_purchase"),
        n2.alias("n_click"),
        F.round(md, 6).alias("mean_diff_cents"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df_welch"),
        F.when(F.abs(t) > 1.959964, 1).otherwise(0).cast("int").alias(
            "mean_differs"
        ),
    )


# --------------------------------------------------------------------------
# x298 — Tukey box-plot panel (quartile fences, whiskers, outlier counts)
# --------------------------------------------------------------------------

_BOX_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
rk AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
q AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3
  FROM rk GROUP BY event_type
),
f AS (
  SELECT event_type, n, q1, med, q3,
         2 * q1 - 3 * (q3 - q1) AS lo2,
         2 * q3 + 3 * (q3 - q1) AS hi2
  FROM q
)
SELECT v.event_type, MAX(f.n) AS n,
       ROUND(MAX(f.q1) / 100.0, 2) AS q1,
       ROUND(MAX(f.med) / 100.0, 2) AS median,
       ROUND(MAX(f.q3) / 100.0, 2) AS q3,
       CAST(MAX(f.q3 - f.q1) AS BIGINT) AS iqr_cents,
       ROUND(MIN(CASE WHEN 2 * v.cents >= f.lo2 THEN v.cents END) / 100.0, 2)
         AS whisker_lo,
       ROUND(MAX(CASE WHEN 2 * v.cents <= f.hi2 THEN v.cents END) / 100.0, 2)
         AS whisker_hi,
       CAST(SUM(CASE WHEN 2 * v.cents < f.lo2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_outliers,
       CAST(SUM(CASE WHEN 2 * v.cents > f.hi2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_outliers
FROM v JOIN f ON f.event_type = v.event_type
GROUP BY v.event_type
"""


@register("agg_boxplot_tukey", oracle=_BOX_ORACLE)
def agg_boxplot_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x298: TUKEY BOX-PLOT PANEL per event type — rank-discrete
    quartiles, 1.5·IQR fences, whisker values (extreme observations
    INSIDE the fences) and per-side outlier counts: the distribution-
    free outlier screen beside x127's MAD (median-centered) and x287's
    JB (moment-based). Quartile ranks are pure integer arithmetic
    (q1 at rank ceil(n/4) = (n+3) div 4 — spelled identically in both
    engines, never a float percentile), and the fence compare runs in
    DOUBLED cents (2x vs 2q1−3·IQR) so the half-integer 1.5·IQR never
    materializes — every comparison is exact int64.

    100 TB: one rank pass per type (value-grain; swap for the count-
    grain midrank rollup past ~1e9 distinct cents — x289's note), one
    broadcast of the 5-row fence frame back across the scan, one
    map-combined conditional agg."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    # r15 (guide §2.5; the x330 agg_mood_median adjudication — same events
    # value domain, 130:1 cents compression at sf0.1, grid-bounded at ANY
    # corpus size): the quartiles now come from the VALUE-grain histogram
    # (map-combined groupBy, cum window over |support| rows per type)
    # instead of a per-type row_number over every event — the old sort ran
    # each type's entire corpus through one window task. The value at rank
    # r is the min value whose cum ≥ r (x106's device: equal values are
    # rank-adjacent, so the pick is value-identical). The whisker/outlier
    # pass below consumes the SAME histogram weighted by t — the second
    # corpus scan is gone too. No eager pin: ReuseExchange shares the
    # histogram exchange between the two consumers (A/B'd — unpinned
    # 0.70 vs pinned 0.74 s). Head-to-head interleaved medians vs the
    # row-grain form: 0.707 -> 0.729 s, a ~3% LOCAL regression kept
    # deliberately for the two corpus-scale terms it removes (the
    # agg_mood_median r14 adjudication accepted the same trade).
    hist = v.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    w_t = Window.partitionBy("event_type")
    wcum = w_t.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = hist.select(
        "event_type",
        "cents",
        "t",
        F.sum("t").over(wcum).alias("cum"),
        F.sum("t").over(w_t).alias("n"),
    )
    q = c.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 3) div 4"), F.col("cents"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("cents"))
        ).alias("med"),
        F.min(
            F.when(F.col("cum") >= F.expr("(3 * n + 3) div 4"), F.col("cents"))
        ).alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "med",
        "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("lo2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("hi2"),
    )
    j = hist.join(F.broadcast(f), "event_type")
    x2 = 2 * F.col("cents")
    return j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.round(F.max("q1") / 100.0, 2).alias("q1"),
        F.round(F.max("med") / 100.0, 2).alias("median"),
        F.round(F.max("q3") / 100.0, 2).alias("q3"),
        F.max(F.col("q3") - F.col("q1")).cast("long").alias("iqr_cents"),
        F.round(
            F.min(F.when(x2 >= F.col("lo2"), F.col("cents"))) / 100.0, 2
        ).alias("whisker_lo"),
        F.round(
            F.max(F.when(x2 <= F.col("hi2"), F.col("cents"))) / 100.0, 2
        ).alias("whisker_hi"),
        F.sum(F.when(x2 < F.col("lo2"), F.col("t")).otherwise(0))
        .cast("long")
        .alias("n_low_outliers"),
        F.sum(F.when(x2 > F.col("hi2"), F.col("t")).otherwise(0))
        .cast("long")
        .alias("n_high_outliers"),
    )


# --------------------------------------------------------------------------
# x299 — association rules with lift (support / confidence over baskets)
# --------------------------------------------------------------------------

_RULES_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM ob),
bc AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS nb FROM ob GROUP BY brand
),
pr AS (
  SELECT a.brand AS ba, b.brand AS bb, CAST(COUNT(*) AS BIGINT) AS nab
  FROM ob a JOIN ob b ON b.ok = a.ok AND a.brand < b.brand
  GROUP BY a.brand, b.brand
),
dir AS (
  SELECT ba AS ante, bb AS cons, nab FROM pr
  UNION ALL
  SELECT bb, ba, nab FROM pr
)
SELECT d.ante AS antecedent, d.cons AS consequent,
       d.nab AS n_joint,
       ROUND(CAST(d.nab AS DOUBLE) / t.n, 6) AS support,
       ROUND(CAST(d.nab AS DOUBLE) / ca.nb, 6) AS confidence,
       ROUND(CAST(d.nab AS DOUBLE) * t.n
             / (CAST(ca.nb AS DOUBLE) * cb.nb), 6) AS lift
FROM dir d
JOIN bc ca ON ca.brand = d.ante
JOIN bc cb ON cb.brand = d.cons
CROSS JOIN tot t
WHERE d.nab * 100 >= t.n
"""


@register("basket_association_rules", oracle=_RULES_ORACLE)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x299: ASSOCIATION RULES over order baskets at brand grain —
    support / confidence / LIFT per directed rule, min-support 1%:
    x100 stops at pair counts (support); this adds the margins that
    make a recommendation signal (confidence = P(cons|ante), lift =
    joint over independence). The min-support gate is INTEGER-SIDED
    (100·n_ab >= N — a float support can't straddle it).

    Exactness: every count is an exact integer off the distinct
    (order, brand) collapse; the three ratios are single divisions of
    integers, 6dp-pinned; lift keeps the n_a·n_b product in DOUBLE
    (n_a up to ~1e10 at 100 TB squares past int64).

    100 TB: the pair join is WITHIN-ORDER (basket-bounded, never
    corpus-quadratic — x100's design), brand margins are a broadcast
    (|brands| rows), and the 1-row total crosses as a broadcast too.
    Apriori beyond pairs = iterate the same bounded join on the
    surviving itemsets."""
    # r14: every count this query needs (grand total, brand margins,
    # joint pair counts) is a sum over the x100 brand-MASK histogram —
    # bounded by min(|orders|, 2^|brands|) rows at ANY corpus size — so
    # the whole rule table computes on the shared bounded kernel instead
    # of checkpointing the |orders|-scale distinct basket frame and
    # self-joining it (the r13 spelling, kept verbatim as the >62-brand
    # fallback). Same exact integers (pair-identity locked by test), same
    # single-division 6dp-pinned ratios, same integer-sided support gate
    # (the grand total folds in as a literal like x100 — no BNLJ cross).
    brands, joined, hist, n_orders = _brand_mask_hist(spark, sf_dir)
    if hist is None:
        return _basket_association_rules_selfjoin(joined)
    powers = [1 << i for i in range(len(brands))]
    seq = F.sequence(F.lit(0), F.lit(len(brands) - 1))
    p_at = lambda c: F.element_at(F.lit(powers), c + 1)  # noqa: E731
    brand_of = lambda c: F.element_at(  # noqa: E731
        F.lit(brands), c.cast("int") + 1
    )
    ex = hist.select(F.explode(seq).alias("i"), "mask", "cnt").filter(
        F.col("mask").bitwiseAND(p_at(F.col("i"))) != 0
    )
    brand_n = ex.groupBy(F.col("i").alias("b")).agg(
        F.sum("cnt").cast("long").alias("n_b")
    )
    pr = (
        ex.select("i", F.explode(seq).alias("j"), "mask", "cnt")
        .filter(
            (F.col("j") > F.col("i"))
            & (F.col("mask").bitwiseAND(p_at(F.col("j"))) != 0)
        )
        .groupBy(F.col("i").alias("ba"), F.col("j").alias("bb"))
        .agg(F.sum("cnt").cast("long").alias("nab"))
    )
    dirn = pr.select(
        F.col("ba").alias("ante"), F.col("bb").alias("cons"), "nab"
    ).unionAll(pr.select(F.col("bb").alias("ante"), F.col("ba").alias("cons"), "nab"))
    ca = brand_n.select(F.col("b").alias("ante"), F.col("n_b").alias("na"))
    cb = brand_n.select(F.col("b").alias("cons"), F.col("n_b").alias("nc"))
    j = (
        dirn.join(F.broadcast(ca), "ante")
        .join(F.broadcast(cb), "cons")
        .filter(F.col("nab") * 100 >= F.lit(n_orders))
    )
    return j.select(
        brand_of(F.col("ante")).alias("antecedent"),
        brand_of(F.col("cons")).alias("consequent"),
        F.col("nab").alias("n_joint"),
        F.round(F.col("nab").cast("double") / F.lit(n_orders), 6).alias(
            "support"
        ),
        F.round(F.col("nab").cast("double") / F.col("na"), 6).alias(
            "confidence"
        ),
        F.round(
            F.col("nab").cast("double")
            * F.lit(n_orders)
            / (F.col("na").cast("double") * F.col("nc")),
            6,
        ).alias("lift"),
    )


def _basket_association_rules_selfjoin(joined: DataFrame) -> DataFrame:
    """Pre-r14 per-basket spelling of x299 — the >62-brand fallback
    (checkpointed distinct basket frame + within-order self-join; the
    bounded-basket discipline is x100's)."""
    ob = (
        joined.select(
            F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    tot = ob.agg(F.countDistinct("ok").cast("long").alias("n"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    a, b = ob.alias("a"), ob.alias("b")
    pr = (
        a.join(
            b,
            (F.col("b.ok") == F.col("a.ok"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("ba"), F.col("b.brand").alias("bb"))
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
    )
    dirn = pr.select(
        F.col("ba").alias("ante"), F.col("bb").alias("cons"), "nab"
    ).unionAll(pr.select(F.col("bb").alias("ante"), F.col("ba").alias("cons"), "nab"))
    ca = bc.select(F.col("brand").alias("ante"), F.col("nb").alias("na"))
    cb = bc.select(F.col("brand").alias("cons"), F.col("nb").alias("nc"))
    j = (
        dirn.join(F.broadcast(ca), "ante")
        .join(F.broadcast(cb), "cons")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nab") * 100 >= F.col("n"))
    )
    return j.select(
        F.col("ante").alias("antecedent"),
        F.col("cons").alias("consequent"),
        F.col("nab").alias("n_joint"),
        F.round(F.col("nab").cast("double") / F.col("n"), 6).alias("support"),
        F.round(F.col("nab").cast("double") / F.col("na"), 6).alias(
            "confidence"
        ),
        F.round(
            F.col("nab").cast("double")
            * F.col("n")
            / (F.col("na").cast("double") * F.col("nc")),
            6,
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# x300 — decision-stump split search (one-vs-rest Gini, value-grain grid)
# --------------------------------------------------------------------------

_STUMP_TYPES = ("click", "error", "purchase", "signup", "view")

_STUMP_ORACLE = f"""
WITH cell AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT t.target, c.v,
         CAST(SUM(c.c) AS BIGINT) AS n_v,
         CAST(SUM(CASE WHEN c.event_type = t.target THEN c.c ELSE 0 END)
              AS BIGINT) AS pos_v
  FROM cell c
  CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in _STUMP_TYPES)})
    AS t(target)
  GROUP BY 1, 2
),
pre AS (
  SELECT target, v,
         CAST(SUM(n_v) OVER w AS BIGINT) AS nl,
         CAST(SUM(pos_v) OVER w AS BIGINT) AS pl,
         CAST(SUM(n_v) OVER (PARTITION BY target) AS BIGINT) AS n,
         CAST(SUM(pos_v) OVER (PARTITION BY target) AS BIGINT) AS p
  FROM grid
  WINDOW w AS (PARTITION BY target ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
imp AS (
  SELECT target, v, n, p,
    (CAST(nl AS DOUBLE)
     - (CAST(pl AS DOUBLE) * pl
        + CAST(nl - pl AS DOUBLE) * (nl - pl)) / nl)
    + (CAST(n - nl AS DOUBLE)
       - (CAST(p - pl AS DOUBLE) * (p - pl)
          + CAST((n - nl) - (p - pl) AS DOUBLE) * ((n - nl) - (p - pl)))
         / (n - nl)) AS w_split
  FROM pre WHERE nl < n
),
best AS (
  SELECT target, v, n, p, w_split,
         ROW_NUMBER() OVER (PARTITION BY target ORDER BY w_split, v) AS rk
  FROM imp
)
SELECT target AS target_type, n AS n_rows, p AS n_positive,
       ROUND(v / 100.0, 2) AS split_value,
       ROUND((CAST(n AS DOUBLE)
              - (CAST(p AS DOUBLE) * p + CAST(n - p AS DOUBLE) * (n - p)) / n)
             / n, 6) AS gini_parent,
       ROUND(w_split / n, 6) AS gini_split,
       ROUND(((CAST(n AS DOUBLE)
               - (CAST(p AS DOUBLE) * p + CAST(n - p AS DOUBLE) * (n - p)) / n)
              - w_split) / n, 6) AS gini_gain
FROM best WHERE rk = 1
"""


@register("ml_gini_stump", oracle=_STUMP_ORACLE)
def ml_gini_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x300: DECISION-STUMP SPLIT SEARCH — for each event type as a
    one-vs-rest target, the value threshold minimizing weighted Gini
    impurity (the CART split criterion): the single-feature tree
    primitive under every GBDT/random-forest trainer, and the
    quantitative answer to "does value separate this type at all"
    (gini_gain ~ 0 ⇒ no). Candidate splits are ALL distinct cents
    values, evaluated in one prefix-sum pass — never a per-candidate
    scan.

    Exactness: the (value, type) rollup and its prefix sums are exact
    integers; each candidate's weighted impurity n_side − (pos² +
    neg²)/n_side is ONE identically-parenthesized double expression of
    those integers, so the per-target argmin (ties → smallest value)
    picks the same row in both engines (x294's shared-expression
    argument applied to an argmin).

    100 TB: one map-combined (cents, type) agg bounds everything after
    at the value grain (~49k rows × 5 targets); the prefix windows run
    per target partition. Unbounded-domain features swap the exact grid
    for a quantile-grid candidate set (x184's sketch) — same pipeline."""
    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("v"), "event_type"
        )
        .groupBy("v", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    targets = F.explode(
        F.array(*[F.lit(t) for t in _STUMP_TYPES])
    ).alias("target")
    grid = (
        cell.select("v", "event_type", "c", targets)
        .groupBy("target", "v")
        .agg(
            F.sum("c").cast("long").alias("n_v"),
            F.sum(F.when(F.col("event_type") == F.col("target"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("pos_v"),
        )
    )
    w_t = Window.partitionBy("target")
    w_pre = w_t.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = grid.select(
        "target",
        "v",
        F.sum("n_v").over(w_pre).cast("long").alias("nl"),
        F.sum("pos_v").over(w_pre).cast("long").alias("pl"),
        F.sum("n_v").over(w_t).cast("long").alias("n"),
        F.sum("pos_v").over(w_t).cast("long").alias("p"),
    ).filter(F.col("nl") < F.col("n"))
    nl, pl, n, p = F.col("nl"), F.col("pl"), F.col("n"), F.col("p")
    left = nl.cast("double") - (
        pl.cast("double") * pl + (nl - pl).cast("double") * (nl - pl)
    ) / nl
    right = (n - nl).cast("double") - (
        (p - pl).cast("double") * (p - pl)
        + ((n - nl) - (p - pl)).cast("double") * ((n - nl) - (p - pl))
    ) / (n - nl)
    imp = pre.select("target", "v", "n", "p", (left + right).alias("w_split"))
    best = imp.select(
        "*",
        F.row_number()
        .over(w_t.orderBy("w_split", "v"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    parent = n.cast("double") - (
        p.cast("double") * p + (n - p).cast("double") * (n - p)
    ) / n
    return best.select(
        F.col("target").alias("target_type"),
        n.alias("n_rows"),
        p.alias("n_positive"),
        F.round(F.col("v") / 100.0, 2).alias("split_value"),
        F.round(parent / n, 6).alias("gini_parent"),
        F.round(F.col("w_split") / n, 6).alias("gini_split"),
        F.round((parent - F.col("w_split")) / n, 6).alias("gini_gain"),
    )


# --------------------------------------------------------------------------
# x320 — clustered-sampling design effect (one-way ANOVA ICC + DEFF)
# --------------------------------------------------------------------------

_DEFF_ORACLE = """
WITH v AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
cl AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(cents) AS BIGINT) AS t,
         CAST(ROUND((CAST(SUM(cents) AS DOUBLE) / COUNT(*))
                    * SUM(cents) * 100) AS BIGINT) AS q_u
  FROM v GROUP BY user_id
),
g AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(t) AS BIGINT) AS tt,
         CAST(SUM(q_u) AS BIGINT) AS q,
         SUM(CAST(m AS DECIMAL(38, 0)) * m) AS m2
  FROM cl
),
s2 AS (
  SELECT SUM(CAST(cents AS DECIMAL(38, 0)) * cents) AS yy FROM v
),
e AS (
  SELECT n, k,
         (CAST(q AS DOUBLE) / 1e2 - CAST(tt AS DOUBLE) / n * tt) / (k - 1)
           AS msb,
         (CAST(yy AS DOUBLE) - CAST(q AS DOUBLE) / 1e2) / (n - k) AS msw,
         (CAST(n AS DOUBLE) - CAST(m2 AS DOUBLE) / n) / (k - 1) AS m0
  FROM g CROSS JOIN s2
)
SELECT n AS n_events, k AS n_clusters,
       ROUND(m0, 6) AS avg_cluster_size,
       ROUND((msb - msw) / (msb + (m0 - 1) * msw), 6) AS icc,
       ROUND(1.0 + (m0 - 1) * ((msb - msw) / (msb + (m0 - 1) * msw)), 6)
         AS deff
FROM e
"""


@register("agg_design_effect_icc", oracle=_DEFF_ORACLE)
def agg_design_effect_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x320: CLUSTERED-SAMPLING DESIGN EFFECT — the one-way ANOVA
    intraclass correlation of event values within users (clusters) and
    Kish's DEFF = 1 + (m₀−1)·ICC: the number that says how much a
    user-clustered sample inflates variance over simple random
    sampling — the required correction before x318's allocations or
    x200's power analysis are honest on cluster-sampled data. m₀ is
    the ANOVA-correct size (N − Σm²/N)/(k−1), not the plain mean.

    Exactness: x289's pinning scheme — per-cluster t²/m centi-unit
    pinned so the between-cluster sum is an exact integer, Σy² and Σm²
    in DECIMAL(38); MSB/MSW/m₀/ICC/DEFF are one shared-
    parenthesization double epilogue on a 1-row frame.

    100 TB: one map-combined per-user agg + a 1-row reduce (the Σy²
    leg rides the same scan)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    cl = v.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("cents").cast("long").alias("t"),
        F.round(
            (F.sum("cents").cast("double") / F.count(F.lit(1)))
            * F.sum("cents")
            * 100
        )
        .cast("long")
        .alias("q_u"),
    )
    g = cl.agg(
        F.sum("m").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("t").cast("long").alias("tt"),
        F.sum("q_u").cast("long").alias("q"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m")).alias("m2"),
    )
    s2 = v.agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "yy"
        )
    )
    n, k = F.col("n"), F.col("k")
    msb = (
        F.col("q").cast("double") / 1e2
        - F.col("tt").cast("double") / n * F.col("tt")
    ) / (k - 1)
    msw = (F.col("yy").cast("double") - F.col("q").cast("double") / 1e2) / (
        n - k
    )
    m0 = (n.cast("double") - F.col("m2").cast("double") / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    return g.crossJoin(s2).select(
        n.alias("n_events"),
        k.alias("n_clusters"),
        F.round(m0, 6).alias("avg_cluster_size"),
        F.round(icc, 6).alias("icc"),
        F.round(F.lit(1.0) + (m0 - 1) * icc, 6).alias("deff"),
    )


# --------------------------------------------------------------------------
# x322 — logistic regression, one closed-form IRLS (Fisher scoring) step
# --------------------------------------------------------------------------

_LOGREG_ORACLE = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS p,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(x AS DECIMAL(38, 0)) * x) AS sxx,
         CAST(SUM(2 * y - 1) AS BIGINT) AS sz,
         CAST(SUM(x * (2 * y - 1)) AS BIGINT) AS sxz
  FROM v
),
b AS (
  SELECT n, p, sx, sz,
         2.0 * (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * sx) AS bx,
         2.0 * (CAST(sxx AS DOUBLE) * sz - CAST(sx AS DOUBLE) * sxz)
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * sx) AS b0
  FROM mo
)
SELECT n AS n_rows, p AS n_positive,
       ROUND(bx * 100, 6) AS beta_per_dollar,
       ROUND(b0, 6) AS beta_intercept,
       ROUND(1.0 / (1.0 + exp(-(b0 + bx * (CAST(sx AS DOUBLE) / n)))), 6)
         AS prob_at_mean
FROM b
"""


@register("ml_logreg_irls_step", oracle=_LOGREG_ORACLE)
def ml_logreg_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x322: LOGISTIC REGRESSION, one Fisher-scoring (IRLS) step from
    β = 0 for P(purchase | value) — at β = 0 the step has a CLOSED
    FORM: μ = ½, W = ¼I, working response z = 4(y − ½), so
    β₁ = (X'X)⁻¹X'·2(2y−1): weighted least squares on exact integer
    moments, no iteration, no optimizer state. The GLM sibling of
    x66's OLS and the calibrated-probability complement to x300's
    Gini stump (same feature, same target — the stump thresholds, this
    scores). One step is the textbook Rao score direction; further
    steps need per-row weights (the applyInPandas path, noted not
    taken).

    Exactness: all five moments are exact integers (Σx² DECIMAL(38));
    β and the mean-point probability are one shared-parenthesization
    double epilogue (exp's 1-ulp engine skew hides under the 6dp pin
    — x286's lnµ argument in reverse).

    100 TB: ONE map-combined conditional-moment aggregate over the
    scan → 1 row. The d-feature version is the same d² moments +
    a d×d solve on the driver (k×d state, x169's class)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    mo = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(2 * F.col("y") - 1).cast("long").alias("sz"),
        F.sum(F.col("x") * (2 * F.col("y") - 1)).cast("long").alias("sxz"),
    )
    n, sx, sz, sxz = F.col("n"), F.col("sx"), F.col("sz"), F.col("sxz")
    det = n.cast("double") * F.col("sxx").cast("double") - sx.cast(
        "double"
    ) * sx
    bx = 2.0 * (n.cast("double") * sxz - sx.cast("double") * sz) / det
    b0 = (
        2.0
        * (F.col("sxx").cast("double") * sz - sx.cast("double") * sxz)
        / det
    )
    return mo.select(
        n.alias("n_rows"),
        F.col("p").alias("n_positive"),
        F.round(bx * 100, 6).alias("beta_per_dollar"),
        F.round(b0, 6).alias("beta_intercept"),
        F.round(
            F.lit(1.0)
            / (1.0 + F.exp(-(b0 + bx * (sx.cast("double") / n)))),
            6,
        ).alias("prob_at_mean"),
    )


# --------------------------------------------------------------------------
# x326 — Benjamini-Hochberg FDR over a 35-test Jarque-Bera panel
# --------------------------------------------------------------------------

_FDR_ALPHA = 0.05

_FDR_ORACLE = f"""
WITH v AS (
  SELECT event_type,
         CAST(((CAST(epoch_us(ts) AS BIGINT) // 86400000000) + 4) % 7
              AS INTEGER) AS wd,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
mo AS (
  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         SUM(CAST(cents AS DECIMAL(38, 0)) * cents) AS s2,
         SUM(CAST(cents AS DECIMAL(38, 0)) * cents * cents) AS s3,
         SUM(CAST(cents AS DECIMAL(38, 0)) * cents * cents * cents) AS s4
  FROM v GROUP BY event_type, wd
),
cm AS (
  SELECT event_type, wd, n,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
           * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM mo
),
jb AS (
  SELECT event_type, wd, n,
         n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                      / 4.0) AS jb
  FROM cm
),
pv AS (
  SELECT event_type, wd, n, jb, exp(-jb / 2.0) AS p,
         ROW_NUMBER() OVER (ORDER BY exp(-jb / 2.0), event_type, wd) AS rk,
         COUNT(*) OVER () AS m
  FROM jb
),
kstar AS (
  SELECT COALESCE(MAX(CASE WHEN p <= {_FDR_ALPHA} * rk / m
                           THEN rk END), 0) AS k
  FROM pv
)
SELECT event_type, wd, n AS n_cell, ROUND(jb, 6) AS jb_stat,
       ROUND(p, 6) AS p_value,
       CAST(rk AS BIGINT) AS p_rank,
       ROUND({_FDR_ALPHA} * rk / m, 6) AS bh_cutoff,
       CAST(CASE WHEN rk <= kstar.k THEN 1 ELSE 0 END AS INTEGER)
         AS discovery,
       CAST(kstar.k AS BIGINT) AS n_discoveries
FROM pv CROSS JOIN kstar
"""


@register("agg_jb_fdr_panel", oracle=_FDR_ORACLE)
def agg_jb_fdr_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x326: BENJAMINI-HOCHBERG FDR over a 35-hypothesis panel — run
    x287's Jarque-Bera normality test per (type, weekday) cell, then
    apply the BH(1995) step-up correction: the multiple-testing layer
    every per-cell screen in this repo implicitly needs (35 tests at
    α=.05 expect ~2 false flags; BH bounds the EXPECTED FALSE
    DISCOVERY FRACTION instead). df=2 makes the χ² survival EXACTLY
    exp(−JB/2) — a closed form, no incomplete-gamma (the reason JB is
    the right test to demonstrate FDR on in SQL).

    Determinism: moments exact (S3/S4 DECIMAL(38) — cents⁴ overflows
    int64 per ROW); the JB/p chain is x287's shared-parenthesization
    epilogue; the BH rank is (p, type, wd)-pinned; k* = max flagged
    rank makes the step-up a single window max, and discovery = rank
    ≤ k* (the textbook definition — NOT p ≤ its own cutoff, which
    drops the step-up property).

    100 TB: one map-combined (type, wd) 4-moment agg; everything after
    runs on the 35-row panel."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        (((F.col("ts_us") / 86_400_000_000).cast("long") + 4) % 7)
        .cast("int")
        .alias("wd"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    mo = v.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(dec * F.col("cents")).alias("s2"),
        F.sum(dec * F.col("cents") * F.col("cents")).alias("s3"),
        F.sum(dec * F.col("cents") * F.col("cents") * F.col("cents")).alias(
            "s4"
        ),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - 3.0 * mu * (F.col("s2").cast("double") / n)
        + 2.0 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / n
        - 4.0 * mu * (F.col("s3").cast("double") / n)
        + 6.0 * mu * mu * (F.col("s2").cast("double") / n)
        - 3.0 * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    jbf = mo.select("event_type", "wd", "n", jb.alias("jb"))
    p = F.exp(-F.col("jb") / 2.0)
    w_all = Window.partitionBy()
    pv = jbf.select(
        "event_type",
        "wd",
        "n",
        "jb",
        p.alias("p"),
        F.row_number()
        .over(Window.orderBy(p, "event_type", "wd"))
        .alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    flagged = F.when(
        F.col("p") <= _FDR_ALPHA * F.col("rk") / F.col("m"), F.col("rk")
    )
    pv = pv.select(
        "*", F.coalesce(F.max(flagged).over(w_all), F.lit(0)).alias("k")
    )
    return pv.select(
        "event_type",
        "wd",
        n.alias("n_cell"),
        F.round("jb", 6).alias("jb_stat"),
        F.round("p", 6).alias("p_value"),
        F.col("rk").cast("long").alias("p_rank"),
        F.round(_FDR_ALPHA * F.col("rk") / F.col("m"), 6).alias("bh_cutoff"),
        F.when(F.col("rk") <= F.col("k"), 1)
        .otherwise(0)
        .cast("int")
        .alias("discovery"),
        F.col("k").cast("long").alias("n_discoveries"),
    )


# --------------------------------------------------------------------------
# x329 — Kruskal-Wallis H across event types (doubled ranks, tie-corrected)
# --------------------------------------------------------------------------

_CHI2_95 = {
    1: 3.841459,
    2: 5.991465,
    3: 7.814728,
    4: 9.487729,
    5: 11.070498,
    6: 12.591587,
    7: 14.067140,
    8: 15.507313,
    9: 16.918978,
}

_KW_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
rk AS (
  SELECT event_type,
         2 * RANK() OVER (ORDER BY cents) - 1
           + COUNT(*) OVER (PARTITION BY cents) AS r2
  FROM v
),
grp AS (
  SELECT event_type, COUNT(*) AS nj,
         SUM(CAST(r2 AS HUGEINT)) AS rj2
  FROM rk GROUP BY event_type
),
ties AS (
  SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tsum
  FROM (SELECT COUNT(*) AS t FROM v GROUP BY cents)
),
acc AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(ROUND(CAST(rj2 AS DOUBLE) * CAST(rj2 AS DOUBLE)
                        / nj * 1e6) AS HUGEINT)) AS s_u
  FROM grp
)
SELECT n AS n_rows, k AS k_groups,
       ROUND(3.0 * (CAST(s_u AS DOUBLE) / 1e6) / (CAST(n AS DOUBLE) * (n + 1))
             - 3.0 * (n + 1), 6) AS h_stat,
       ROUND((3.0 * (CAST(s_u AS DOUBLE) / 1e6)
              / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
             / (1.0 - CAST(tsum AS DOUBLE)
                / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_corrected,
       CAST(CASE WHEN (3.0 * (CAST(s_u AS DOUBLE) / 1e6)
                       / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                      / (1.0 - CAST(tsum AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n * n - n))
                      > {crit}
                 THEN 1 ELSE 0 END AS INTEGER) AS reject_05
FROM acc CROSS JOIN ties
"""


@register(
    "agg_kruskal_wallis",
    oracle=_KW_ORACLE.replace(
        "{crit}",
        "CASE k - 1 "
        + " ".join(f"WHEN {df} THEN {cv}" for df, cv in _CHI2_95.items())
        + " ELSE 1e308 END",
    ),
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x329: KRUSKAL-WALLIS H across the k event types on `value` — the
    k-sample generalization of x276's Mann-Whitney: do ANY of the types
    draw values from a shifted distribution, without x297's Welch
    normality assumption? The rank-based sibling of x293's ANOVA.

    Exactness: cents-pinned values, DOUBLED average ranks (x278's
    device — 2·avg_rank = 2·rank−1+tie_count, always integer), per-group
    Σ(R2j)²/nj pinned as ROUND((R2j)²/nj·10⁶) — every op in that term
    (decimal→double cast, ·, /, round) is IEEE-deterministic and
    identically parenthesized on both engines, and the CROSS-GROUP sum
    is then over exact DECIMAL(38)/HUGEINT integers, so double summation
    order can never enter (the trap the device exists for). Tie term
    Σ(t³−t) is exact integer. H, the tie correction, and the chi²(k−1)
    95% gate (pinned literal table, df 1-9) are ONE shared epilogue.

    100 TB: one global rank window (percentile-class shuffle, x106),
    then |types| rows. (R2j)² ~ 4N²nj² — DECIMAL(38) holds past 1e12
    rows."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rk = v.select(
        "event_type",
        (
            2 * F.rank().over(Window.orderBy("cents"))
            - 1
            + F.count(F.lit(1)).over(Window.partitionBy("cents"))
        ).alias("r2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grp = rk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nj"), F.sum(dec("r2")).alias("rj2")
    )
    ties = (
        v.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                dec("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    acc = grp.agg(
        F.sum("nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.round(
                F.col("rj2").cast("double")
                * F.col("rj2").cast("double")
                / F.col("nj")
                * 1e6
            ).cast("decimal(38,0)")
        ).alias("s_u"),
    ).crossJoin(ties)
    n, k = F.col("n"), F.col("k")
    h = (
        3.0 * (F.col("s_u").cast("double") / 1e6) / (n.cast("double") * (n + 1))
        - 3.0 * (n + 1)
    )
    corr = 1.0 - F.col("tsum").cast("double") / (
        n.cast("double") * n * n - n
    )
    crit = F.lit(1e308)
    for df_, cv in _CHI2_95.items():
        crit = F.when(k - 1 == df_, F.lit(cv)).otherwise(crit)
    return acc.select(
        n.alias("n_rows"),
        k.alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_corrected"),
        F.when(h / corr > crit, 1).otherwise(0).cast("int").alias("reject_05"),
    )


# --------------------------------------------------------------------------
# x330 — Mood's median test (2 x k counts around the grand median)
# --------------------------------------------------------------------------

_MOOD_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
rk AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (ORDER BY cents) AS rn,
         COUNT(*) OVER () AS nn
  FROM v
),
med AS (SELECT MIN(CASE WHEN rn = (nn + 1) // 2 THEN cents END) AS med FROM rk),
s AS (
  SELECT v.event_type,
         CASE WHEN v.cents > med.med THEN 1 ELSE 0 END AS ab
  FROM v CROSS JOIN med WHERE v.cents <> med.med
),
grp AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
         CAST(SUM(ab) AS BIGINT) AS aj
  FROM s GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(nj) AS BIGINT) AS n, CAST(SUM(aj) AS BIGINT) AS a,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
),
su AS (
  SELECT SUM(CAST(ROUND(CAST(g.aj * t.n - g.nj * t.a AS DOUBLE)
                        * CAST(g.aj * t.n - g.nj * t.a AS DOUBLE)
                        / g.nj * 1e6) AS HUGEINT)) AS s_u
  FROM grp g CROSS JOIN tot t
)
SELECT g.event_type, g.nj AS n_used, g.aj AS n_above, g.nj - g.aj AS n_below,
       ROUND(CAST(g.nj AS DOUBLE) * t.a / t.n, 6) AS expected_above,
       ROUND((CAST(u.s_u AS DOUBLE) / 1e6)
             / (CAST(t.a AS DOUBLE) * (t.n - t.a)), 6) AS chi2_stat,
       CAST(CASE WHEN (CAST(u.s_u AS DOUBLE) / 1e6)
                      / (CAST(t.a AS DOUBLE) * (t.n - t.a)) > {crit}
                 THEN 1 ELSE 0 END AS INTEGER) AS reject_05
FROM grp g CROSS JOIN tot t CROSS JOIN su u
"""


@register(
    "agg_mood_median",
    oracle=_MOOD_ORACLE.replace(
        "{crit}",
        "CASE t.k - 1 "
        + " ".join(f"WHEN {df} THEN {cv}" for df, cv in _CHI2_95.items())
        + " ELSE 1e308 END",
    ),
)
def agg_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x330: MOOD'S MEDIAN TEST — dichotomize every value at the GRAND
    rank-discrete lower median (x129's device), drop exact ties with it
    (x291's convention), and Pearson-chi² the resulting 2×k table: the
    crudest but most outlier-proof k-sample location test — only
    above/below survives, so a type whose tail is wild but whose median
    matches cannot trigger it (the contrast with x329 is the point).

    Exactness: the 2×k chi² collapses to χ² = Σj (aj·N − nj·A)² /
    (nj·A·B) — per-type numerators (aj·N − nj·A) are exact int64,
    the /nj terms pinned to integers via x329's ROUND(·10⁶) device so
    the cross-group sum is exact, then ONE shared epilogue with the
    pinned chi² table. Per-type rows publish the observed/expected
    split and the shared statistic.

    100 TB: one global rank window for the median + one (type) agg; the
    chi² assembly is |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    # VALUE-GRAIN rewrite (r14, the x99 agg_weighted_percentile device):
    # ONE map-combined (type, cents) histogram is the only corpus pass —
    # the old form ran a single-partition row_number over EVERY event for
    # the grand median (the §2 skew hazard) and then re-scanned the corpus
    # for the above/below split. Equal cents are adjacent in rank order,
    # so the row at rank ⌊(N+1)/2⌋ has the first cents whose cumulative
    # count reaches that rank (min over cc ≥ target ≡ the old min over
    # rn == target), and the per-type counts are exact integer sums of
    # histogram cells. The global cum window now runs over the bounded
    # |price-grid| support, never rows.
    hist = (
        v.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    gv = hist.groupBy("cents").agg(F.sum("cnt").cast("long").alias("c"))
    w_ord = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = gv.select(
        "cents",
        F.sum("c").over(w_ord).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("nn"),
    )
    med = cum.agg(
        F.min(
            F.when(
                F.col("cc") >= F.floor((F.col("nn") + 1) / 2), F.col("cents")
            )
        ).alias("med")
    )
    grp = (
        hist.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("med"))
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("nj"),
            F.sum(
                F.when(F.col("cents") > F.col("med"), F.col("cnt")).otherwise(0)
            )
            .cast("long")
            .alias("aj"),
        )
    )
    tot = grp.agg(
        F.sum("nj").cast("long").alias("n"),
        F.sum("aj").cast("long").alias("a"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    num = (F.col("aj") * F.col("n") - F.col("nj") * F.col("a")).cast("double")
    s_u = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.round(num * num / F.col("nj") * 1e6)
            .cast("decimal(38,0)")
            .alias("u")
        )
        .agg(F.sum("u").alias("s_u"))
    )
    n, a, k = F.col("n"), F.col("a"), F.col("k")
    chi2 = (F.col("s_u").cast("double") / 1e6) / (
        a.cast("double") * (n - a)
    )
    crit = F.lit(1e308)
    for df_, cv in _CHI2_95.items():
        crit = F.when(k - 1 == df_, F.lit(cv)).otherwise(crit)
    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(s_u))
        .select(
            "event_type",
            F.col("nj").alias("n_used"),
            F.col("aj").alias("n_above"),
            (F.col("nj") - F.col("aj")).alias("n_below"),
            F.round(F.col("nj").cast("double") * a / n, 6).alias(
                "expected_above"
            ),
            F.round(chi2, 6).alias("chi2_stat"),
            F.when(chi2 > crit, 1).otherwise(0).cast("int").alias("reject_05"),
        )
    )


# --------------------------------------------------------------------------
# x331 — two-sample Cramér-von Mises (purchase vs view values)
# --------------------------------------------------------------------------

_CVM_ORACLE = """
WITH v AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events WHERE event_type IN ('purchase', 'view')
),
rk AS (
  SELECT g, cents,
         ROW_NUMBER() OVER (ORDER BY cents, event_id) AS r,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY cents, event_id) AS i
  FROM v
),
u AS (
  SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         SUM(CASE WHEN g = 1
                  THEN CAST(r - i AS HUGEINT) * (r - i) ELSE 0 END) AS d1,
         SUM(CASE WHEN g = 0
                  THEN CAST(r - i AS HUGEINT) * (r - i) ELSE 0 END) AS d2
  FROM rk
)
SELECT n1 AS n_purchase, n2 AS n_view,
       ROUND((CAST(n1 AS DOUBLE) * CAST(d1 AS DOUBLE)
              + CAST(n2 AS DOUBLE) * CAST(d2 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2))
             - (4.0 * n1 * n2 - 1) / (6.0 * (n1 + n2)), 6) AS cvm_t,
       CAST(CASE WHEN (CAST(n1 AS DOUBLE) * CAST(d1 AS DOUBLE)
                       + CAST(n2 AS DOUBLE) * CAST(d2 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2))
                      - (4.0 * n1 * n2 - 1) / (6.0 * (n1 + n2)) > 0.461
                 THEN 1 ELSE 0 END AS INTEGER) AS reject_05
FROM u
"""


@register("agg_cramer_von_mises", oracle=_CVM_ORACLE)
def agg_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x331: TWO-SAMPLE CRAMÉR-VON MISES between purchase and view
    values — the INTEGRATED-squared-ECDF-gap test: where x259's KS sees
    only the single worst gap, CvM accumulates every gap, so it catches
    distributions that differ mildly EVERYWHERE (scale/shape drift)
    that KS's max misses. Anderson's rank form: T = [n1·Σ(ri−i)² +
    n2·Σ(sj−j)²]/(n1·n2·N) − (4n1n2−1)/(6N).

    Exactness: ranks are ROW_NUMBERs over the (cents, event_id) total
    order — the house tie-break contract (x58) makes the with-ties
    statistic well-defined and IDENTICAL on both engines (the classical
    formula assumes continuity; the pinned total order is our published
    convention, documented here). (r−i)² sums are exact
    DECIMAL(38)/HUGEINT (Σ ≤ N³); T and the 0.461 asymptotic 5% gate
    are one shared epilogue.

    100 TB: one global rank window over the two-type subset + one
    per-group rank window (same sort key — ONE shuffle, Catalyst reuses
    the exchange); the moment agg is map-combined."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
    )
    rk = v.select(
        "g",
        F.row_number().over(Window.orderBy("cents", "event_id")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("g").orderBy("cents", "event_id"))
        .alias("i"),
    )
    d = (F.col("r") - F.col("i")).cast("decimal(38,0)")
    u = rk.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("g") == 1, d * d).otherwise(F.lit(0))).alias("d1"),
        F.sum(F.when(F.col("g") == 0, d * d).otherwise(F.lit(0))).alias("d2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    t = (
        n1.cast("double") * F.col("d1").cast("double")
        + n2.cast("double") * F.col("d2").cast("double")
    ) / (n1.cast("double") * n2 * (n1 + n2)) - (4.0 * n1 * n2 - 1) / (
        6.0 * (n1 + n2)
    )
    return u.select(
        n1.alias("n_purchase"),
        n2.alias("n_view"),
        F.round(t, 6).alias("cvm_t"),
        F.when(t > 0.461, 1).otherwise(0).cast("int").alias("reject_05"),
    )


# --------------------------------------------------------------------------
# x336 — 1-D Wasserstein-1 (earth mover's) distance, purchase vs view
# --------------------------------------------------------------------------

_EMD_ORACLE = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events WHERE event_type IN ('purchase', 'view')
),
pc AS (
  SELECT cents,
         CAST(SUM(g) AS BIGINT) AS c1,
         CAST(SUM(1 - g) AS BIGINT) AS c2
  FROM v GROUP BY cents
),
cum AS (
  SELECT cents,
         SUM(c1) OVER (ORDER BY cents) AS cum1,
         SUM(c2) OVER (ORDER BY cents) AS cum2,
         SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2,
         LEAD(cents) OVER (ORDER BY cents) AS nxt
  FROM pc
)
SELECT CAST(MAX(n1) AS BIGINT) AS n_purchase,
       CAST(MAX(n2) AS BIGINT) AS n_view,
       CAST(COUNT(*) AS BIGINT) AS n_support,
       ROUND(CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                           ELSE CAST(ABS(cum1 * n2 - cum2 * n1) AS HUGEINT)
                                * (nxt - cents) END) AS DOUBLE)
             / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)), 6) AS emd_cents,
       ROUND(CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                           ELSE CAST(ABS(cum1 * n2 - cum2 * n1) AS HUGEINT)
                                * (nxt - cents) END) AS DOUBLE)
             / (CAST(MAX(n1) AS DOUBLE) * MAX(n2))
             / (MAX(cents) - MIN(cents)), 6) AS emd_per_cent_of_range
FROM cum
"""


@register("agg_emd_wasserstein", oracle=_EMD_ORACLE)
def agg_emd_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x336: 1-D WASSERSTEIN-1 / EARTH MOVER'S DISTANCE between purchase
    and view value distributions — the metric completion of the
    two-sample family: x259's KS reads the worst ECDF gap, x331's CvM
    the integrated SQUARED gap (scale-free), W1 = ∫|F1−F2| dx reads the
    gap in the UNITS OF THE VARIABLE — 'how many cents would you have to
    move, on average, to turn one distribution into the other', the
    number a pricing or drift-budget conversation actually wants.

    Exactness: at cents grain W1·n1·n2 = Σ_support |cum1·n2 − cum2·n1|
    ·Δx is an exact DECIMAL(38)/HUGEINT integer (each |·| ≤ n1·n2 ~ 1e10
    at sf0.1, ·Δx ≤ 1e14 per term — int64 dies by 5e4 support points,
    hence DECIMAL); ONE division by the exact n1·n2 at the end, 6dp.
    The per-cent-of-range normalization divides by the exact integer
    support span.

    100 TB: one (cents) groupBy collapses the corpus to |distinct
    values| rows (~5e4) BEFORE any window; the cumulative/lead windows
    run unpartitioned on that collapsed frame only (x259's percentile-
    class pattern). Sample sizes ride the same window — no second scan,
    no driver collect."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
    )
    pc = v.groupBy("cents").agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(1 - F.col("g")).cast("long").alias("c2"),
    )
    w_ord = Window.orderBy("cents")
    w_all = Window.partitionBy()
    cum = pc.select(
        "cents",
        F.sum("c1").over(w_ord).alias("cum1"),
        F.sum("c2").over(w_ord).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
        F.lead("cents").over(w_ord).alias("nxt"),
    )
    # Widen BEFORE the multiply: cum*n in int64 overflows once n1*n2
    # passes ~9.2e18 (trillions-of-rows territory) — the decimal(38,0)
    # products keep the docstring's exactness claim true at 100 TB and
    # match the oracle's HUGEINT arithmetic.
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    term = F.when(F.col("nxt").isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
        F.abs(d38("cum1") * d38("n2") - d38("cum2") * d38("n1"))
        * (F.col("nxt") - F.col("cents"))
    )
    acc = cum.agg(
        F.max("n1").cast("long").alias("n_purchase"),
        F.max("n2").cast("long").alias("n_view"),
        F.count(F.lit(1)).cast("long").alias("n_support"),
        F.sum(term).alias("s"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )
    w1 = F.col("s").cast("double") / (
        F.col("n_purchase").cast("double") * F.col("n_view")
    )
    return acc.select(
        "n_purchase",
        "n_view",
        "n_support",
        F.round(w1, 6).alias("emd_cents"),
        F.round(w1 / (F.col("hi") - F.col("lo")), 6).alias(
            "emd_per_cent_of_range"
        ),
    )
