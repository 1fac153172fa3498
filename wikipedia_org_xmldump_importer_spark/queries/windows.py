"""SURVEY.md §2.5 — window functions w1-w7.

100 TB notes: every window here partitions by a real key (custkey / user_id)
— no global windows except o1's judged sequence. Shuffle cost is one exchange
on the partition key; frames are streaming (running) or bounded (moving avg),
so state per key is O(frame), not O(group). Skewed partition keys behave like
join skew: salt + two-phase if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_W1_ORACLE = """
SELECT
  o_custkey, o_orderkey,
  RANK()       OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
"""


@register("win_rank", oracle=_W1_ORACLE)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


_W2_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("win_topk_per_group", oracle=_W2_ORACLE)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. 100 TB: rank-filter windows push the rn<=k
    predicate into the window operator (WindowGroupLimit in Spark 3.5+) so
    per-key heaps never materialize the full partition sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


_W3_ORACLE = """
SELECT
  event_id, user_id,
  CAST(date_diff('microsecond',
                 lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS BIGINT) AS us_since_prev,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


@register("win_lag_lead", oracle=_W3_ORACLE)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas between consecutive events. Integer µs arithmetic on
    the ts_us convenience column — identical across engines (no float)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


_W4_ORACLE = """
SELECT
  o_custkey, o_orderkey,
  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
  ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
FROM orders
"""


@register("win_running", oracle=_W4_ORACLE)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("o_custkey").orderBy(*order_cols).rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg3"),
    )


# Trailing 1 hour inclusive, expressed as integer microseconds on both sides.
_W5_ORACLE = """
SELECT
  event_id, user_id,
  ROUND(SUM(value) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS trailing_1h_value
FROM events
"""


@register("win_range_frame", oracle=_W5_ORACLE)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: per-user trailing-1h value sum. The RANGE frame runs
    on epoch-µs longs (ts_us), so frame boundaries are exact integers on both
    engines — float-free and DST-free."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h_value"),
    )


_W6_ORACLE = """
SELECT
  c_custkey, c_mktsegment,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
  ROUND(cume_dist() OVER w, 6) AS cdist,
  ROUND(percent_rank() OVER w, 6) AS prank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("win_ntile_cume", oracle=_W6_ORACLE)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


_W7_ORACLE = """
SELECT
  user_id,
  arg_max(event_type, ts) AS last_type,
  arg_min(event_type, ts) AS first_type,
  max(ts) AS last_ts,
  min(ts) AS first_ts
FROM events
GROUP BY user_id
"""


@register("win_first_last", oracle=_W7_ORACLE)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest/earliest event per user via max_by/min_by — the aggregate
    spelling of first/last-value frames (the 'latest revision per page'
    pattern from the importer's destination schema, SURVEY §1.2). ts is
    unique per user at µs precision, so arg extremes are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_type"),
        F.min_by("event_type", "ts").alias("first_type"),
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
    )


# w8: IGNORE NULLS window navigation. The fixtures are null-free, so NULLs
# are derived deterministically (error events have no usable value) — same
# rule on both engines.
_W8_ORACLE = """
SELECT event_id, user_id,
       ROUND(LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                        IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS carried,
       ROUND(NTH_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 2
                       IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_seen
FROM events
"""


@register("win_ignore_nulls", oracle=_W8_ORACLE)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w8: IGNORE NULLS navigation — last non-null carried forward (the
    sensor-reading LOCF idiom) and the 2nd non-null seen so far, per user
    in event order. NULLs derive from a deterministic rule (error events)
    so both engines mask identically.

    100 TB notes: same cost envelope as any per-user window — one shuffle
    on user_id, a frame-bounded scan per partition; IGNORE NULLS adds no
    extra pass (the runner tracks the last non-null as it walks)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(v, ignorenulls=True).over(w), 2).alias("carried"),
        F.round(F.nth_value(v, 2, ignoreNulls=True).over(w), 2).alias(
            "second_seen"
        ),
    )


# --------------------------------------------------------------------------
# x58 — batch sessionization (gaps-and-islands)
# --------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, integer microseconds

_SESSIONIZE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {_SESSION_GAP_US}
              OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY user_id, session_id
"""


@register("win_sessionize", oracle=_SESSIONIZE_ORACLE)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x58: batch sessionization — the gaps-and-islands idiom. A session
    breaks when a user's inter-event gap exceeds 30 minutes; session_id is
    the running count of break flags, then one aggregate per (user,
    session). The per-event-ID twin of st3's session_window aggregation
    (which only yields window bounds — this yields stable per-session ids
    an events pipeline can join on).

    Ordering is (ts_us, event_id) — the tiebreaker makes lag() and the
    running sum deterministic under equal timestamps on both engines; all
    arithmetic is integer microseconds, no float anywhere.

    100 TB: ONE shuffle on user_id serves both windows and the final
    aggregate (same partitioning, Catalyst reuses the exchange); per-key
    state is O(1) (lag + running sum are streaming frames). Skewed users
    salt like any window key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("new_sess").over(run).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


# --------------------------------------------------------------------------
# x75 — running DISTINCT count via first-occurrence flags
# --------------------------------------------------------------------------

_WRD_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
f AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts_us, event_id) = 1
                 THEN 1 ELSE 0 END AS first_flag
  FROM e
)
SELECT event_id, user_id, ts_us, event_type,
       CAST(SUM(first_flag) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_distinct_types
FROM f
"""


@register("win_running_distinct", oracle=_WRD_ORACLE)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x75: running COUNT(DISTINCT) over a window — not directly supported
    by any engine's window DISTINCT (Spark rejects it), so it is rewritten
    exactly: flag each (user, type)'s FIRST occurrence with row_number,
    then a running SUM of flags per user. The breadth-of-engagement curve
    (how many distinct behaviors a user has shown by time t).

    100 TB: two window passes — (user, type) then (user) — the second
    re-shuffles to the coarser key; both are linear per partition. The
    first-occurrence flag trick generalizes to any windowed distinct agg
    (sum distinct: flag × value). Casting the SUM to keep int64 on both
    engines; oracle mirrors the identical rewrite."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        F.when(F.row_number().over(w_first) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("first_flag"),
    )
    return f.select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        F.sum("first_flag").over(w_run).alias("n_distinct_types"),
    )


# --------------------------------------------------------------------------
# x103 — percent-of-total within group (integer-cent exact shares)
# --------------------------------------------------------------------------

_POT_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS bal_cents
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       ROUND(bal_cents / 100.0, 2) AS balance,
       ROUND(CAST(bal_cents AS DOUBLE)
             / SUM(bal_cents) OVER (PARTITION BY region), 6) AS share_of_region
FROM rev
"""


@register("win_percent_of_total", oracle=_POT_ORACLE)
def win_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x103: percent-of-total — each nation's share of its region's
    customer balance, the ubiquitous reporting window (share-of-segment,
    contribution margin, mix analysis).

    The group total is an UNORDERED window SUM, so the summed quantity
    must be order-insensitive: balances convert to integer CENTS at the
    row level and every aggregate from there is exact integer arithmetic;
    floats appear only in the final two display projections (÷100 and the
    share ratio), both over identical operands on both engines.

    100 TB: agg to (region, nation) grain first — the window partitions
    over dim-cardinality rows, never the fact table; one shuffle for the
    agg, the window rides the same partitioning by region."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("bal_cents")
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.round(F.col("bal_cents") / 100.0, 2).alias("balance"),
        F.round(
            F.col("bal_cents").cast("double") / F.sum("bal_cents").over(w), 6
        ).alias("share_of_region"),
    )


# --------------------------------------------------------------------------
# x150 — floor-at-zero running balance via Skorokhod reflection
# --------------------------------------------------------------------------

_REFLECT_ORACLE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT)
              WHEN event_type = 'click'
              THEN -CAST(ROUND(value * 100) AS BIGINT)
         END AS delta
  FROM events
  WHERE event_type IN ('purchase', 'click')
),
s0 AS (
  SELECT user_id, ts, event_id,
         SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM d
),
s AS (
  SELECT user_id, ts, event_id, s,
         MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
  FROM s0
),
b AS (
  SELECT user_id,
         s - LEAST(0, run_min) AS bal,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM s
)
SELECT user_id,
       ROUND(CAST(MAX(CASE WHEN rn = 1 THEN bal END) AS DOUBLE) / 100.0, 2)
         AS final_balance,
       ROUND(CAST(MAX(bal) AS DOUBLE) / 100.0, 2) AS peak_balance,
       CAST(SUM(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_floor_rows
FROM b GROUP BY user_id
"""


@register("win_reflected_running", oracle=_REFLECT_ORACLE)
def win_reflected_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x150: FLOOR-AT-ZERO running balance — purchases credit a user's
    meter, clicks drain it, and the balance can never go negative:
    B_t = max(B_{t-1} + δ_t, 0). That recurrence looks like it needs a
    sequential stateful UDF (each step depends on the clamped previous
    step) — but the one-sided SKOROKHOD REFLECTION identity solves it in
    closed form: B_t = S_t − min(0, min_{s≤t} S_s), the raw running sum
    minus the (clamped) running minimum of the running sum. Two stacked
    windows over the SAME (user_id, ts) sort — pure Catalyst, no state
    machine, no applyInPandas. The per-user report: final balance, peak
    balance, and how many rows sat pinned at the floor.

    This is the general template for "running agg with a one-sided
    barrier" (inventory that can't go negative, rate-limit token buckets,
    capped queues); a ceiling barrier reflects with max symmetric.

    100 TB: one exchange on user_id feeds both window layers, the
    trailing-extreme rank, and the final agg — a single sort, reused
    (NOTES trap: both windows MUST share frame + order to stay in one
    WindowExec)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", cents).otherwise(-cents).alias(
            "delta"
        ),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = d.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("delta").over(wrun).alias("s"),
    ).withColumn("run_min", F.min("s").over(wrun))
    wlast = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b = s.select(
        "user_id",
        (F.col("s") - F.least(F.lit(0), F.col("run_min"))).alias("bal"),
        F.row_number().over(wlast).alias("rn"),
    )
    return b.groupBy("user_id").agg(
        F.round(
            F.max(F.when(F.col("rn") == 1, F.col("bal"))).cast("double") / 100.0, 2
        ).alias("final_balance"),
        F.round(F.max("bal").cast("double") / 100.0, 2).alias("peak_balance"),
        F.sum((F.col("bal") == 0).cast("int")).cast("long").alias("n_floor_rows"),
    )


# --------------------------------------------------------------------------
# x274 — trailing-window feature generation (7/30/90-day range frames)
# --------------------------------------------------------------------------

_TRAIL_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                           RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS cnt_7d,
       CAST(COALESCE(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                                      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cents_7d,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                           RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS cnt_30d,
       CAST(COALESCE(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                                      RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cents_30d,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                           RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS cnt_90d,
       CAST(COALESCE(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                                      RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cents_90d
FROM o
"""


@register("feature_trailing_windows", oracle=_TRAIL_ORACLE)
def feature_trailing_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x274: TRAILING-WINDOW FEATURE GENERATION — per order, the
    customer's prior-order count and spend over the trailing 7/30/90
    days, all EXCLUSIVE of the current day (RANGE ... 1 PRECEDING): the
    standard anti-leakage discipline for point-in-time ML features
    (same-day sibling orders must not see each other, x273's embargo
    argument at row grain). This is w5's range-frame machinery doing its
    real production job: one shuffle, six features.

    Exclusive-bound subtlety: a same-day order is OUTSIDE the frame in
    BOTH engines because the frame is on the integer day value, not row
    position — ROWS frames would be partition-order-dependent with
    same-day ties; RANGE frames are value-determined and tie-safe.

    100 TB: ONE shuffle on o_custkey serves all six windows (Catalyst
    collapses same-partitioning window specs into one sort); frames are
    value-bounded so state per customer is the 90-day slice, not
    history. Features at entity grain = the feature-store fill pattern."""
    orders = load_table(spark, sf_dir, "orders")
    # epoch-day by pure NTZ integer arithmetic (io.load_table's device) —
    # unix_timestamp() would reinterpret the NTZ date in the SESSION zone,
    # silently shifting day boundaries on any non-UTC driver session
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "timestampdiff(DAY, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ),"
            " o_orderdate)"
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def trail(days: int):
        return (
            Window.partitionBy("o_custkey")
            .orderBy("day")
            .rangeBetween(-days, -1)
        )

    out = o
    for d in (7, 30, 90):
        out = out.withColumn(
            f"cnt_{d}d", F.count(F.lit(1)).over(trail(d)).cast("long")
        ).withColumn(
            f"cents_{d}d",
            F.coalesce(F.sum("cents").over(trail(d)), F.lit(0)).cast("long"),
        )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "day",
        "cnt_7d",
        "cents_7d",
        "cnt_30d",
        "cents_30d",
        "cnt_90d",
        "cents_90d",
    )
