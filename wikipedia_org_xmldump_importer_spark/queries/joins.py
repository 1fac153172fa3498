"""SURVEY.md §2.3 — joins j1-j9.

100 TB notes (per operator, see docstrings): the rule of thumb baked in here
is *broadcast every bounded dimension, shuffle only fact×fact on their FK*,
and keep non-equi joins' small side broadcastable so BroadcastNestedLoop
never materializes an O(n²) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.asof import asof_join
from ..registry import register

_J1_ORACLE = """
SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price, c.c_name, c.c_nationkey
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 400000
"""


@register("join_inner_equi", oracle=_J1_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join orders⋈customer. 100 TB: shuffles both sides on custkey
    (or zero-shuffle if both are bucketed on custkey at write time); AQE may
    demote to broadcast when the filtered side is small."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "c_name",
        "c_nationkey",
    )


_J2_ORACLE = """
SELECT c.c_custkey, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_acctbal > 9000
"""


@register("join_broadcast", oracle=_J2_ORACLE)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim joins with *forced* broadcast (asserted in tests/test_plans.py).
    100 TB: nation (25 rows) and region (5 rows) ship to every executor once;
    the customer fact never shuffles for these lookups."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


_J3_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
  ON c.c_custkey = o.o_custkey
"""


@register("join_outer", oracle=_J3_ORACLE)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (covers left/right null-production in both directions).
    100 TB: full outer forces a shuffle join (no broadcast path); AQE skew
    split applies. Null-heavy results stay columnar."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


_J4_ORACLE = """
SELECT c_custkey, 'has_big_order' AS tag FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
UNION ALL
SELECT c_custkey, 'no_big_order' AS tag FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


@register("join_semi_anti", oracle=_J4_ORACLE)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti (existence/absence). 100 TB: semi/anti shuffle
    only the *keys* of the right side after Catalyst prunes columns; prefer
    these over IN-subquery materialization."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    semi = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("tag")
    )
    anti = cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_big_order").alias("tag")
    )
    return semi.unionByName(anti)


_J5_ORACLE = """
SELECT r.r_name AS band, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS total_value
FROM events e
JOIN region r
  ON e.value >= r.r_regionkey * 100.0 AND e.value < (r.r_regionkey + 1) * 100.0
GROUP BY r.r_name
"""


@register("join_theta_range", oracle=_J5_ORACLE)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join (value ∈ [lo, hi)). 100 TB: the band table is tiny
    and broadcast, so this is a BroadcastNestedLoop over the fact — linear,
    not O(n²). Never range-join two unbounded facts directly; bucket the
    range into an equi-join key first (see join_interval for that pattern)."""
    events = load_table(spark, sf_dir, "events")
    region = load_table(spark, sf_dir, "region")
    bands = region.select(
        F.col("r_name"),
        (F.col("r_regionkey") * 100.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 100.0).alias("hi"),
    )
    return (
        events.join(
            F.broadcast(bands),
            (events.value >= bands.lo) & (events.value < bands.hi),
        )
        .groupBy(F.col("r_name").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_J6_ORACLE = """
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
"""


@register("join_cross", oracle=_J6_ORACLE)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — bounded inputs only (5×25). 100 TB: cross joins
    are only ever sane dim×dim; engine policy is to keep
    spark.sql.crossJoin semantics explicit via .crossJoin()."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


_J7_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register("join_asof", oracle=_J7_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it by the
    same user (operators/asof.py composite — see its 100 TB notes)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view")
    return asof_join(
        probe=purchases,
        reference=views,
        key="user_id",
        probe_ts="ts",
        ref_ts="ts",
        carry={"ts": "view_ts"},
        ref_tiebreak="event_id",
    )


_J7F_ORACLE = """
SELECT v.event_id, v.user_id, v.ts, p.ts AS next_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id AND p.ts >= v.ts
"""


@register("join_asof_forward", oracle=_J7F_ORACLE)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x71: forward as-of join — for each view, the NEXT purchase at-or-after
    it by the same user (the time-to-convert primitive; j7 looks backward,
    this is the same operators/asof.py composite with direction="forward":
    flipped frame + first() instead of last(), identical one-shuffle cost)."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    return asof_join(
        probe=views,
        reference=purchases,
        key="user_id",
        probe_ts="ts",
        ref_ts="ts",
        carry={"ts": "next_purchase_ts"},
        ref_tiebreak="event_id",
        direction="forward",
    )


_J8_ORACLE = """
SELECT o.o_orderstatus, COUNT(*) AS n_lines, ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderstatus
"""


@register("join_interval", oracle=_J8_ORACLE)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: ship date within [order date, +30d). 100 TB:
    the equi part (orderkey) drives the shuffle; the range predicate is a
    post-join filter on co-located rows — this is the scalable shape for
    interval joins (equi-key first, range residual second)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


_J9_ORACLE = """
SELECT a.o_custkey AS custkey, a.o_orderkey AS ok1, b.o_orderkey AS ok2
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND ABS(a.o_totalprice - b.o_totalprice) < 1000
"""


@register("join_self", oracle=_J9_ORACLE)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: near-equal-price order pairs per customer. 100 TB: one
    shuffle on custkey, per-key pair expansion bounded by orders-per-customer
    (~10); unbounded keys would need a window-based banding instead."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.alias("a")
    b = orders.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.abs(F.col("a.o_totalprice") - F.col("b.o_totalprice")) < 1000),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("ok1"),
        F.col("b.o_orderkey").alias("ok2"),
    )


_SALT_ORACLE = """
SELECT n.n_name AS nation_name,
       COUNT(*) AS n_cust,
       ROUND(SUM(c.c_acctbal), 2) AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

_N_SALTS = 8


@register("join_skew_salted", oracle=_SALT_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: the fact side adds a random-ish salt
    (deterministic here: pmod(xxhash64(row-id), N)), the dim side explodes
    ×N, and the join key becomes (key, salt) — splitting any hot key's rows
    across N tasks. Result provably identical to the plain join (the SQL
    oracle IS the unsalted join).

    100 TB notes: this is the manual fallback when AQE's skew-join split
    can't help (e.g. skewed key feeding a groupBy on the same key, or
    pre-AQE engines). Costs: dim side ×N rows (fine for dims), fact side
    unchanged. N sizes to worst-key-rows / target-partition-rows."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.xxhash64("c_custkey"), F.lit(_N_SALTS)).cast("int")
    )
    nation = load_table(spark, sf_dir, "nation").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
    )
    return (
        cust.join(
            nation,
            (cust.c_nationkey == nation.n_nationkey) & (cust.salt == nation.salt),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# j10: the same band-join RESULT as join_theta_range, but via interval
# binning — the shape that survives when BOTH sides are unbounded and
# broadcast is off the table. Oracle = the plain range join.
_J10_ORACLE = """
SELECT r.r_name AS band, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS total_value
FROM events e
JOIN region r
  ON e.value >= r.r_regionkey * 100.0 AND e.value < (r.r_regionkey + 1) * 100.0
GROUP BY r.r_name
"""

_BIN_W = 50.0  # bin width; bands are width-100 so each explodes to 2 bins


@register("join_range_binned", oracle=_J10_ORACLE)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j10: range join via interval binning — hash-identical to
    join_theta_range's BNLJ result, but executed as an EQUI join on a
    discretized bin key (plan-asserted: no BroadcastNestedLoopJoin).

    Shape: each interval explodes to the fixed-width bins it overlaps
    (blow-up = interval_width / bin_width per row, here 2×); each fact row
    lands in exactly ONE bin, so the equi-join on bin plus the residual
    range predicate reproduces the θ-join without any per-pair evaluation
    — and because a fact row has one bin, no post-join dedup is needed.

    100 TB notes: this is THE scalable range-join recipe — shuffle both
    sides on bin (or broadcast the exploded interval side if it's still
    small), pick bin_width ≈ median interval width so the explode factor
    stays ~2. join_theta_range documents the broadcast-BNLJ shortcut for
    a tiny band table; this row proves the unbounded-case plan."""
    events = load_table(spark, sf_dir, "events")
    region = load_table(spark, sf_dir, "region")
    bands = region.select(
        F.col("r_name"),
        (F.col("r_regionkey") * 100.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 100.0).alias("hi"),
    )
    # bins covered by [lo, hi): floor(lo/W) .. floor((hi - epsilon)/W);
    # the half-open upper end must not spill into the next bin when hi is
    # bin-aligned, hence the tiny epsilon inside the floor.
    binned_bands = bands.select(
        "r_name",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W).cast("long"),
                F.floor((F.col("hi") - F.lit(1e-9)) / _BIN_W).cast("long"),
            )
        ).alias("bin"),
    )
    binned_events = events.withColumn(
        "bin", F.floor(F.col("value") / _BIN_W).cast("long")
    )
    return (
        binned_events.join(binned_bands, "bin")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy(F.col("r_name").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# x104 — nearest-neighbor as-of join (both directions, closest wins)
# --------------------------------------------------------------------------

_J_NEAREST_ORACLE = """
WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
back AS (
  SELECT v.event_id, v.user_id, v.ts, pb.ts AS prev_ts
  FROM v ASOF LEFT JOIN p pb
    ON v.user_id = pb.user_id AND pb.ts <= v.ts
),
paired AS (
  SELECT b.event_id, b.user_id, b.ts, b.prev_ts, pf.ts AS next_ts
  FROM back b ASOF LEFT JOIN p pf
    ON b.user_id = pf.user_id AND pf.ts >= b.ts
)
SELECT event_id, user_id, ts,
       CASE
         WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
         WHEN next_ts IS NULL THEN prev_ts
         WHEN prev_ts IS NULL THEN next_ts
         WHEN epoch_us(ts) - epoch_us(prev_ts)
              <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
         ELSE next_ts
       END AS nearest_purchase_ts,
       CASE
         WHEN prev_ts IS NULL AND next_ts IS NULL THEN 'none'
         WHEN next_ts IS NULL THEN 'prev'
         WHEN prev_ts IS NULL THEN 'next'
         WHEN epoch_us(ts) - epoch_us(prev_ts)
              <= epoch_us(next_ts) - epoch_us(ts) THEN 'prev'
         ELSE 'next'
       END AS direction
FROM paired
"""


@register("join_asof_nearest", oracle=_J_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x104: NEAREST-neighbor temporal join — for each view, the purchase
    closest in time in EITHER direction (j7 looks back, x71 looks
    forward; this composes both and picks the smaller gap, ties to the
    backward side). The 1-D nearest-neighbor primitive sensor/attribution
    pipelines want when causality isn't one-sided.

    Gap comparison is integer epoch-microsecond arithmetic — exact, no
    float tie ambiguity; the tie rule (<= keeps 'prev') is explicit and
    mirrored in the oracle.

    100 TB: two composite as-of passes over the same user_id shuffle
    (operators/asof.py is a window, not a join — no row multiplication),
    then a pure projection picks the winner. Cost = 2× j7, still one
    logical shuffle key."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    back = asof_join(
        probe=views,
        reference=purchases,
        key="user_id",
        probe_ts="ts",
        ref_ts="ts",
        carry={"ts": "prev_ts"},
        ref_tiebreak="event_id",
        direction="backward",
    )
    both = asof_join(
        probe=back,
        reference=purchases,
        key="user_id",
        probe_ts="ts",
        ref_ts="ts",
        carry={"ts": "next_ts"},
        ref_tiebreak="event_id",
        direction="forward",
    )
    # ts is TIMESTAMP_NTZ (io.load_table): timestampdiff works on NTZ,
    # unix_micros does not.
    prev_gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    next_gap = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    prev_wins = (F.col("prev_ts").isNotNull()) & (
        F.col("next_ts").isNull() | (prev_gap <= next_gap)
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(prev_wins, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
        .alias("nearest_purchase_ts"),
        F.when(F.col("prev_ts").isNull() & F.col("next_ts").isNull(), F.lit("none"))
        .when(prev_wins, F.lit("prev"))
        .otherwise(F.lit("next"))
        .alias("direction"),
    )


# --------------------------------------------------------------------------
# x114 — null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_J_NULLSAFE_ORACLE = """
WITH o1 AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_a, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
),
o2 AS (
  SELECT nullif(o_orderstatus, 'P') AS status_b,
         COUNT(*) AS n_right,
         ROUND(SUM(o_totalprice), 2) AS right_total
  FROM orders WHERE o_orderkey % 2 = 1
  GROUP BY nullif(o_orderstatus, 'P')
)
SELECT COALESCE(o1.status_a, 'NULL') AS status,
       COUNT(*) AS n_left,
       MAX(o2.n_right) AS n_right,
       ROUND(SUM(o1.o_totalprice), 2) AS left_total
FROM o1 JOIN o2 ON o1.status_a IS NOT DISTINCT FROM o2.status_b
GROUP BY o1.status_a
"""


@register("join_null_safe", oracle=_J_NULLSAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x114: NULL-SAFE equality join — Spark's <=> (eqNullSafe), SQL's IS
    NOT DISTINCT FROM: NULL keys MATCH each other instead of silently
    dropping, the semantics every slowly-changing-dimension and
    late-typed-key pipeline eventually needs (a plain equi join on a
    nullable key loses the NULL partition without an error). Keys here
    are deliberately nullable (status 'P' mapped to NULL), the two sides
    are disjoint halves of orders, and the NULL group's survival in the
    output is the proof the join kept it.

    100 TB: eqNullSafe compiles to a hash join on a null-coalesced key —
    same shuffle shape as plain equi, NOT a nested loop (plan-audited);
    the NULL bucket is one more hash key, so a mostly-NULL column skews
    exactly like any hot key and takes the same salting fix (x20)."""
    orders = load_table(spark, sf_dir, "orders")
    o1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_a"),
        "o_totalprice",
    )
    o2 = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_b"))
        .agg(
            F.count(F.lit(1)).alias("n_right"),
            F.round(F.sum("o_totalprice"), 2).alias("right_total"),
        )
    )
    return (
        o1.join(o2, o1.status_a.eqNullSafe(o2.status_b))
        .groupBy("status_a")
        .agg(
            F.count(F.lit(1)).alias("n_left"),
            F.max("n_right").alias("n_right"),
            F.round(F.sum("o_totalprice"), 2).alias("left_total"),
        )
        .select(
            F.coalesce(F.col("status_a"), F.lit("NULL")).alias("status"),
            "n_left",
            "n_right",
            "left_total",
        )
    )


# --------------------------------------------------------------------------
# x120 — as-of join with a match tolerance (bounded-staleness lookup)
# --------------------------------------------------------------------------

_ASOF_TOL_US = 3_600_000_000  # 1 hour

_J_TOL_ORACLE = f"""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
v AS (SELECT * FROM events WHERE event_type = 'view'),
matched AS (
  SELECT p.event_id, p.user_id, p.ts, vb.ts AS view_ts
  FROM p ASOF LEFT JOIN v vb
    ON p.user_id = vb.user_id AND vb.ts <= p.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN view_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(view_ts) <= {_ASOF_TOL_US}
            THEN view_ts END AS view_ts_within_1h,
       CASE WHEN view_ts IS NULL THEN 'no_view'
            WHEN epoch_us(ts) - epoch_us(view_ts) <= {_ASOF_TOL_US} THEN 'fresh'
            ELSE 'stale' END AS match_quality
FROM matched
"""


@register("join_asof_tolerance", oracle=_J_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x120: as-of join with a MATCH TOLERANCE — the most recent view
    before each purchase, but only if it is at most 1 hour old; older
    matches are voided to NULL and labeled 'stale' (pandas merge_asof's
    tolerance semantics, the bounded-staleness rule every feature-store
    lookup needs: a year-old feature row should NOT silently join).

    The tolerance is applied AFTER the one-per-probe as-of pick — a
    too-old nearest match yields NULL, it does not fall through to an
    even older row (mirrored exactly in the oracle); the gap test is
    integer microseconds.

    100 TB: identical cost to j7 (one composite as-of window pass); the
    tolerance is a projection, not a join predicate, so no extra state."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view")
    matched = asof_join(
        probe=purchases,
        reference=views,
        key="user_id",
        probe_ts="ts",
        ref_ts="ts",
        carry={"ts": "view_ts"},
        ref_tiebreak="event_id",
        direction="backward",
    )
    gap = F.expr("timestampdiff(MICROSECOND, view_ts, ts)")
    fresh = F.col("view_ts").isNotNull() & (gap <= _ASOF_TOL_US)
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("view_ts")).alias("view_ts_within_1h"),
        F.when(F.col("view_ts").isNull(), F.lit("no_view"))
        .when(fresh, F.lit("fresh"))
        .otherwise(F.lit("stale"))
        .alias("match_quality"),
    )


# --------------------------------------------------------------------------
# x246 — 2-D grid-bucketed neighbor join (the spatial-join idiom, no geo)
# --------------------------------------------------------------------------

_G2D_SIZE_BAND = 1  # |size_a - size_b| <= 1
_G2D_PRICE_BAND_C = 100  # |retail_a - retail_b| <= $1.00 in cents

_G2D_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
         p_size // {_G2D_SIZE_BAND + 1} AS gx,
         CAST(ROUND(p_retailprice * 100) AS BIGINT)
           // {_G2D_PRICE_BAND_C} AS gy
  FROM part
),
cand AS (
  SELECT DISTINCT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_size AS size_a, b.p_size AS size_b,
         a.cents AS cents_a, b.cents AS cents_b
  FROM p a
  JOIN (SELECT unnest(generate_series(-1, 1)) AS dx) sx ON TRUE
  JOIN (SELECT unnest(generate_series(-1, 1)) AS dy) sy ON TRUE
  JOIN p b ON b.gx = a.gx + sx.dx AND b.gy = a.gy + sy.dy
          AND a.p_partkey < b.p_partkey
)
SELECT key_a, key_b,
       CAST(ABS(size_a - size_b) AS BIGINT) AS d_size,
       CAST(ABS(cents_a - cents_b) AS BIGINT) AS d_cents
FROM cand
WHERE ABS(size_a - size_b) <= {_G2D_SIZE_BAND}
  AND ABS(cents_a - cents_b) <= {_G2D_PRICE_BAND_C}
"""


@register("join_grid_2d", oracle=_G2D_ORACLE)
def join_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x246: 2-D GRID-BUCKETED NEIGHBOR JOIN — parts within BOTH a size
    band (±{_G2D_SIZE_BAND}) and a price band (±$1) of each other, found
    via the canonical spatial-join decomposition: snap each point to a
    grid cell sized >= the band, explode each LEFT row to its 3x3
    neighbor cells, equi-join on the cell id, verify the exact band
    predicate. This is how geo/spatial joins actually execute at scale
    (geohash/S2 cells are this with curved cells) — and the 2-D
    generalization of j10's 1-D binned range join: neither predicate
    alone is selective, but the CELL is.

    Correctness argument: cell edge = band + 1, so any qualifying pair
    is at most one cell apart on each axis — the 3x3 neighborhood is
    EXHAUSTIVE (the pigeonhole that makes grid joins exact, not
    approximate). One side explodes 9x (cheap, integers); the join
    stays equi on (gx, gy); the verify is two integer ABS compares in
    codegen.

    100 TB: candidate volume = Σ per-cell |A_cell|·|B_3x3| — bounded by
    density, never |A|·|B|; skewed hot cells salt like any join key.
    Plan-audit-clean: no BNLJ, no cartesian — the band predicate rides
    an equi-join."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    ).withColumns(
        {
            "gx": F.expr(f"p_size DIV {_G2D_SIZE_BAND + 1}"),
            "gy": F.expr(f"cents DIV {_G2D_PRICE_BAND_C}"),
        }
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_size").alias("size_a"),
        F.col("cents").alias("cents_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct(gx + dx AS gx, gy + dy AS gy))))"
            )
        ).alias("cell"),
    ).select("key_a", "size_a", "cents_a", "cell.gx", "cell.gy")
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_size").alias("size_b"),
        F.col("cents").alias("cents_b"),
        "gx",
        "gy",
    )
    # No distinct needed: only side A explodes (9 DISTINCT neighbor cells),
    # side B keeps its single home cell, so a (key_a, key_b) pair can match
    # on at most ONE cell id — the join emits every candidate exactly once
    # and the old .distinct() was a full exchange+dedup of the candidate
    # set that provably changed nothing (r14; contrast one-sided vs the
    # both-sides-exploded grid variants where dedup IS required).
    cand = (
        a.join(b, ["gx", "gy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "size_a", "size_b", "cents_a", "cents_b")
    )
    return cand.filter(
        (F.abs(F.col("size_a") - F.col("size_b")) <= _G2D_SIZE_BAND)
        & (F.abs(F.col("cents_a") - F.col("cents_b")) <= _G2D_PRICE_BAND_C)
    ).select(
        "key_a",
        "key_b",
        F.abs(F.col("size_a") - F.col("size_b")).cast("long").alias("d_size"),
        F.abs(F.col("cents_a") - F.col("cents_b")).cast("long").alias("d_cents"),
    )


# --------------------------------------------------------------------------
# x275 — blocked fuzzy join (sorted-neighborhood edit-distance matching)
# --------------------------------------------------------------------------

_FUZZY_MAXDIST = 6
_FUZZY_NEIGHBORS = 10

_FUZZY_ORACLE = f"""
WITH rk AS (
  SELECT p_partkey, p_brand, p_size, p_name,
         ROW_NUMBER() OVER (PARTITION BY p_brand, p_size
                            ORDER BY p_name, p_partkey) AS r
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_brand, a.p_size,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM rk a JOIN rk b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND b.r BETWEEN a.r + 1 AND a.r + {_FUZZY_NEIGHBORS}
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAXDIST}
"""


@register("join_fuzzy_blocked", oracle=_FUZZY_ORACLE)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x275: BLOCKED FUZZY JOIN by SORTED NEIGHBORHOOD (Hernandez &
    Stolfo) — entity resolution\'s scale-sane shape: candidate pairs come
    from equi-joinable blocking keys (brand x size), and WITHIN a block
    only name-sort neighbors within rank distance {_FUZZY_NEIGHBORS}
    are compared (near-duplicate names share prefixes and sort
    adjacent), with levenshtein <= {_FUZZY_MAXDIST} as the match
    predicate. The deliberate middle ground between exact equi-join
    (j1, misses typos) and all-pairs similarity (x7\'s anti-pattern) —
    and unlike naive blocking, pair volume is |block|·w LINEAR in block
    size, not |block|² (the sf1 sweep caught the quadratic form at 35x
    wall for 10x data; this form is the fix, not a cap bolted on).

    Determinism: the neighborhood is defined by a (p_name, p_partkey)
    tie-pinned rank, and levenshtein is an exact integer on identical
    definitions in both engines — no float surface anywhere.

    100 TB: one (brand, size) shuffle for the rank window, one more for
    the self-join; per-row fan-out is the constant w. Recall tuning is
    the published knob set: widen w, add a second sort pass on a
    different key (multi-pass sorted neighborhood), or swap the sort key
    for a phonetic/fingerprint key."""
    part = load_table(spark, sf_dir, "part")
    rk = part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        "p_name",
        F.row_number()
        .over(
            Window.partitionBy("p_brand", "p_size").orderBy(
                "p_name", "p_partkey"
            )
        )
        .alias("r"),
    )
    a = rk.select(
        F.col("p_partkey").alias("key_a"),
        "p_brand",
        "p_size",
        F.col("p_name").alias("name_a"),
        F.col("r").alias("ra"),
    )
    b = rk.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_size").alias("size_b"),
        F.col("p_name").alias("name_b"),
        F.col("r").alias("rb"),
    )
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("p_size") == F.col("size_b"))
            & (F.col("rb") > F.col("ra"))
            & (F.col("rb") <= F.col("ra") + _FUZZY_NEIGHBORS),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= _FUZZY_MAXDIST)
        .select(
            "key_a",
            "key_b",
            "p_brand",
            "p_size",
            "name_a",
            "name_b",
            "edit_dist",
        )
    )
