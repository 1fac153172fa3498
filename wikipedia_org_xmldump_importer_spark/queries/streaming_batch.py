"""SURVEY.md §2.9 — batch twins of the Structured Streaming operators
(st1-st7).

Each entry here runs the SAME transformation the streaming module
(streaming/) runs over a file-replayed stream; tests/test_streaming.py
asserts stream-result == batch-result (SURVEY §5.3), and the DuckDB oracle
checks the batch semantics. window()/session_window() work identically in
batch mode, so these are true twins, not re-implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# Spark's window() aligns tumbling windows to the epoch, as does DuckDB's
# time_bucket for sub-day intervals.
_ST1_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("stream_tumbling", oracle=_ST1_ORACLE)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h tumbling windows × event_type. 100 TB streaming notes: with a
    watermark this is incremental per-window partial aggregation; state =
    open windows only. In batch: a plain group-by on the bucketed ts."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total_value",
        )
    )


# Sliding windows: each event belongs to window starts
# time_bucket(15m, ts) - {0,15,30,45}m; all four satisfy wstart <= ts < wstart+1h.
_ST2_ORACLE = """
SELECT wstart, wstart + INTERVAL '1 hour' AS wend, COUNT(*) AS n
FROM (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
         - unnest([INTERVAL '0 minutes', INTERVAL '15 minutes',
                   INTERVAL '30 minutes', INTERVAL '45 minutes']) AS wstart
  FROM events
)
GROUP BY wstart
"""


@register("stream_sliding", oracle=_ST2_ORACLE)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 15m (each event in 4 windows). 100 TB: state
    and output scale ×(window/slide) — keep the ratio small; Spark's window()
    expands via Expand, still one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "n")
    )


# Gaps-and-islands reconstruction of session_window semantics:
# new session when ts - prev_ts > 30min; session end = last ts + gap.
_ST3_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
islands AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, sid
"""


@register("stream_session", oracle=_ST3_ORACLE)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30m gap) per user via session_window(). 100 TB
    streaming: state = one open session per key; batch mode merges via
    the same Expand+aggregate plan. The oracle is the classic
    gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(sw.alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


_ST5_ORACLE = """
SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
FROM events
GROUP BY event_type
"""


@register("stream_dedup", oracle=_ST5_ORACLE)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup on event_id — batch twin of
    dropDuplicatesWithinWatermark (exercised with a duplicated-id replay
    chunk in tests/test_streaming.py). 100 TB streaming: the watermark
    bounds the dedup state to the lateness horizon instead of all-time."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


# st6 batch twin: per-user funnel — views strictly before first purchase.
_ST6_ORACLE = """
WITH first_p AS (
  SELECT user_id, MIN(ts) AS first_purchase_ts
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT e.user_id,
       f.first_purchase_ts,
       COUNT(*) FILTER (e.event_type = 'view' AND e.ts < f.first_purchase_ts)
         AS views_before_purchase
FROM events e JOIN first_p f ON e.user_id = f.user_id
GROUP BY e.user_id, f.first_purchase_ts
"""


@register("stream_funnel", oracle=_ST6_ORACLE)
def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel state machine (views → first purchase) — batch twin of the
    transformWithStateInPandas/applyInPandasWithState operator in
    streaming/stateful.py. 100 TB: the batch form is join+conditional-agg
    (one shuffle on user_id); the streaming form keeps O(1) state per user."""
    ev = load_table(spark, sf_dir, "events")
    first_p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return (
        ev.join(first_p, "user_id")
        .groupBy("user_id", "first_purchase_ts")
        .agg(
            F.count(
                F.when(
                    (F.col("event_type") == "view")
                    & (F.col("ts") < F.col("first_purchase_ts")),
                    1,
                )
            ).alias("views_before_purchase")
        )
    )


_ST7_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("stream_static_join", oracle=_ST7_ORACLE)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (events × customer dim) — batch twin of
    streaming/join.py. 100 TB streaming: the static side is broadcast per
    micro-batch (refreshable dim); never shuffle the stream for a bounded
    dim."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_ST7B_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
"""


@register("stream_stream_join", oracle=_ST7B_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded stream-stream join (purchases × views within the
    preceding hour, per user) — batch twin of streaming/ops.py
    stream_stream_join, which runs the same predicate with watermarks on
    both sides so each side's join state stays bounded.

    Timestamps are emitted as epoch-microsecond longs (ts_us rides along
    from io.load_table) — integer-exact across engines.

    100 TB notes: Catalyst plans this as an equi-join on user_id with the
    interval predicate as a join-level filter — one shuffle per side on the
    join key; the time band never becomes a nested-loop. In streaming the
    same shape is incremental: watermark + interval bound ⇒ each view row
    is dropped from state one hour past its event time."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("ts_us").alias("v_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), F.col("ts_us").alias("p_us")
    )
    cond = (
        (p.user_id == v.v_user)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    return p.join(v, cond, "inner").select("event_id", "user_id", "p_us", "v_us")


# st14 — trending top-k per tumbling window (batch twin)
_ST14_ORACLE = """
WITH c AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT wstart, wend, event_type, n,
       CAST(ROW_NUMBER() OVER (PARTITION BY wstart
                               ORDER BY n DESC, event_type) AS BIGINT) AS rk
FROM c QUALIFY rk <= 2
"""


@register("stream_trending_topk", oracle=_ST14_ORACLE)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st14 batch twin: the 2 most frequent event types per 1h tumbling
    window (ties by event_type asc) — the "trending now" panel. The
    streaming half (streaming/ops.py start_trending_topk) gets window
    finality from append-mode watermarking and ranks each closed window
    statelessly in foreachBatch; tests/test_streaming.py asserts
    stream == batch under the watermark cutoff.

    100 TB: the count agg is the only row-scale shuffle (map-combined,
    low-cardinality keys); the rank window partitions by wstart over
    |windows|×|types| aggregated rows."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    c = (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
        )
    )
    w = Window.partitionBy("wstart").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return c.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= 2
    )


# st15 — per-user hourly rate cap (batch twin)
_ST15_CAP = 5

_ST15_ORACLE = f"""
WITH r AS (
  SELECT user_id,
         CAST(epoch(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))
              // 3600 AS BIGINT) AS wstart_hr,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, wstart_hr,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn <= {_ST15_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM r GROUP BY user_id, wstart_hr
"""


@register("stream_user_rate_cap", oracle=_ST15_ORACLE)
def stream_user_rate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st15 batch twin: per (user, 1h window) admission totals under a
    keep-first-{_ST15_CAP} rate cap — (ts, event_id)-ordered row_number
    against the cap. The live half (streaming/ops.user_rate_cap_stream)
    holds two integers of state per user; tests assert final stream
    emits == this.

    100 TB: one map-combined (user, window) agg — no window, no sort.
    r15 (guide §1.2 — don't compute what you throw away): the old form
    row_number'd every event inside its (user, window) partition and then
    only COUNTED the rows with rn <= cap — but #rows with rn <= cap is
    exactly least(n_events, cap), so the report needs no per-row ranks at
    all. (The rank picks WHICH rows survive; this operator only reports
    HOW MANY — the live streaming half still keeps the two-integer
    first-k state.) Value-identical by that identity; interleaved 5-shot
    medians 0.68 -> 0.38 s at sf0.1, the per-partition sort gone."""
    ev = load_table(spark, sf_dir, "events")
    hr = (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast(
        "long"
    )
    return (
        ev.select("user_id", hr.alias("wstart_hr"))
        .groupBy("user_id", "wstart_hr")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            "wstart_hr",
            "n_events",
            F.least(F.col("n_events"), F.lit(_ST15_CAP).cast("long")).alias(
                "n_kept"
            ),
        )
    )


# st16 — exact distinct users per window (batch twin)
_ST16_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


@register("stream_window_distinct_users", oracle=_ST16_ORACLE)
def stream_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st16 batch twin: exact distinct users per 1h window. The live half
    (streaming/ops.window_distinct_users_stream) chains
    dropDuplicates([user, window]) → windowed COUNT — the standard recipe
    for the unsupported streaming COUNT(DISTINCT); stream == batch under
    the watermark cutoff is tested. In batch, a plain distinct count.

    100 TB: (window, user)-grain expand then window-grain agg — both
    map-combined; swap in x21's HLL partials when the per-window user
    set outgrows exact state."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_users",
        )
    )


# --------------------------------------------------------------------------
# st18 batch twin — daily PSI drift vs a first-week reference histogram
# --------------------------------------------------------------------------

_ST18_ORACLE = """
WITH ev AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day_idx,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) // 5000 AS bucket,
         day(ts) AS dom
  FROM events
),
cells AS (
  SELECT day_idx, event_type, bucket, COUNT(*) AS c_day
  FROM ev GROUP BY day_idx, event_type, bucket
),
ref AS (
  SELECT event_type, bucket, COUNT(*) AS c_ref
  FROM ev WHERE dom <= 7 GROUP BY event_type, bucket
),
nref AS (SELECT event_type, SUM(c_ref) AS n_ref FROM ref GROUP BY event_type),
dom AS (
  SELECT DISTINCT event_type, bucket FROM cells
  UNION SELECT event_type, bucket FROM ref
),
nday AS (
  SELECT day_idx, event_type, SUM(c_day) AS n_day
  FROM cells GROUP BY day_idx, event_type
),
grid AS (
  SELECT nd.day_idx, nd.event_type, d.bucket, nd.n_day
  FROM nday nd JOIN dom d ON d.event_type = nd.event_type
),
joined AS (
  SELECT g.day_idx, g.event_type, g.n_day,
         COALESCE(c.c_day, 0) AS c_day, COALESCE(r.c_ref, 0) AS c_ref,
         nr.n_ref
  FROM grid g
  LEFT JOIN cells c ON c.day_idx = g.day_idx
                   AND c.event_type = g.event_type AND c.bucket = g.bucket
  LEFT JOIN ref r ON r.event_type = g.event_type AND r.bucket = g.bucket
  JOIN nref nr ON nr.event_type = g.event_type
),
terms AS (
  SELECT day_idx, event_type, n_day,
         CAST(ROUND((ROUND((c_day + 1.0) / (n_day + 10), 6)
                     - ROUND((c_ref + 1.0) / (n_ref + 10), 6))
                    * ln(ROUND((c_day + 1.0) / (n_day + 10), 6)
                         / ROUND((c_ref + 1.0) / (n_ref + 10), 6))
                    * 1000000) AS BIGINT) AS t_u
  FROM joined
)
SELECT day_idx, event_type, CAST(MAX(n_day) AS BIGINT) AS n_day,
       CAST(SUM(t_u) AS BIGINT) AS psi_u
FROM terms GROUP BY day_idx, event_type
"""


@register("stream_psi_daily", oracle=_ST18_ORACLE)
def stream_psi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st18 batch twin: DAILY PSI DRIFT TRAJECTORY — each day's per-type
    value histogram scored against a static first-week reference with the
    x230 PSI device (exact integer buckets, +1 smoothing, micro-unit
    terms). Where x230 answers "did the distribution shift between two
    periods?", this emits the full drift TIME SERIES a model monitor
    alerts on — and its streaming half (streaming/ops.py
    ``start_psi_drift``) computes the identical number live from
    append-mode daily windows, through the SAME kernel
    (operators/psi.py), per-closed-day.

    100 TB: one map-combined (day, type, bucket) histogram agg is the
    only row-scale work; the kernel's joins run on collapsed grids with
    the reference and domain broadcast. Streaming state = open windows'
    partial histograms (bounded by |types| x |buckets| per day)."""
    from ..operators.psi import psi_from_cells  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("ts_us") / 86_400_000_000).cast("long").alias("day_idx"),
        "event_type",
        (F.round(F.col("value") * 100).cast("long") / 5000)
        .cast("long")
        .alias("bucket"),
    )
    # ONE corpus pass (r14): the reference histogram derives from the
    # bounded daily cells frame, not a second scan+agg of events —
    # day-of-month is a pure function of day_idx (ts is NTZ, ts_us its
    # exact epoch-µs, session TZ UTC), so filtering the (day, type,
    # bucket) grain on dayofmonth(date_from_unix_date(day_idx)) ≤ 7 and
    # summing the cell counts gives the identical c_ref integers. The
    # eager pin stops cells/ref/domain re-deriving the corpus agg.
    cells = (
        base.groupBy("day_idx", "event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c_day"))
        .localCheckpoint()
    )
    ref = (
        cells.filter(
            F.dayofmonth(F.expr("date_from_unix_date(CAST(day_idx AS INT))"))
            <= 7
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("c_day").alias("c_ref"))
    )
    domain = cells.select("event_type", "bucket").union(
        ref.select("event_type", "bucket")
    ).distinct()
    return psi_from_cells(cells, ref, domain)
