"""SURVEY.md §2.9 — the Structured Streaming operator surface (st1-st7).

Every transformation here takes a STREAMING events DataFrame (from
sources.stream_events.read_event_stream) and mirrors its batch twin in
queries/streaming_batch.py; tests/test_streaming.py replays events as
micro-batches and asserts stream == batch (SURVEY §5.3).

100 TB notes (apply to all): watermarks bound state to the lateness horizon;
windowed aggregations keep one accumulator per open (window, key); the
stream never repartitions except on the aggregation key itself. Sinks are
idempotent (checkpointed offsets + deterministic file names) so replays
after executor loss do not duplicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F




def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (ltz); the engine's canonical ts is
    TIMESTAMP_NTZ (io.load_table). Cast at the stream head — under the
    engine's pinned UTC session timezone the wall-clock values are
    identical, so stream results compare equal to the NTZ batch twins."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """st1: per-event_type counts in 1h tumbling windows."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """st2: 1h windows sliding every 15m."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """st3: session windows per user (gap-merged; state = one open session
    per key, closed when the watermark passes the gap)."""
    return (
        _with_event_time(events).withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def watermark_late_filter(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """st4: watermark + append-mode window counts — events later than the
    watermark are DROPPED from finalized windows (asserted with a
    hand-written late chunk in tests).

    Exact boundary semantics (empirically pinned in
    tests/test_streaming.py::test_watermark_boundary_window_semantics):
    each window is emitted AT MOST ONCE, in the first batch whose
    start-of-batch watermark passes its end; late rows arriving in that
    same emission batch still count (the late filter lags the eviction
    watermark by one batch — Spark errs toward inclusion; dropping is
    best-effort, finalization is the guarantee); late rows in any later
    batch are dropped and cannot re-open the window. Lateness is judged
    per WINDOW (end <= watermark), not per row — a row older than the
    watermark whose window is still open is aggregated normally."""
    return (
        _with_event_time(events).withWatermark("ts", lateness)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def stateful_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """st5: stateful dedup on event_id — state bounded by the watermark
    (dropDuplicatesWithinWatermark), unlike plain dropDuplicates whose
    state grows forever on an unbounded stream."""
    return _with_event_time(events).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def content_hash_col(*cols) -> Column:
    """Injective sha-256 pre-image over a tuple of columns.

    Two subtleties make a naive ``sha2(concat_ws(sep, ...))`` non-injective:
    NULL fields (concat_ws SKIPS nulls, so (NULL, '2.0') and ('2.0', NULL)
    collide) and separator-bearing values (props 'a<sep>b' re-splits as two
    adjacent fields). Each token is therefore LENGTH-PREFIXED — ``len:value``
    — so field boundaries parse unambiguously regardless of content, and
    NULL becomes the tag ``N`` which no length prefix can produce (lengths
    are digits). Shared by the streaming op and its batch twin test so the
    two surfaces can never drift."""

    def _tok(c):
        s = c.cast("string")
        return F.coalesce(F.concat(F.length(s).cast("string"), F.lit(":"), s), F.lit("N"))

    return F.sha2(F.concat_ws("\x1f", *[_tok(F.col(c) if isinstance(c, str) else c) for c in cols]), 256)


def content_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """st10: streaming twin of the exact-dedup surface (l1 dedup_exact) —
    dedup on a normalized CONTENT hash (user, type, value, props; NOT the
    event_id) with watermark-bounded state, closing the loop between the
    streaming and dedup surfaces: the same payload re-sent under a fresh
    event_id within the horizon is dropped.

    100 TB notes: state is one sha-256 per distinct content inside the
    lateness horizon — the horizon IS the dedup window, so state is
    bounded by content arrival rate × horizon, not stream length.
    Production pairs this cheap online pass with a periodic batch
    dedup_exact sweep for cross-horizon duplicates (the at-least-once
    boundary pinned in test_dedup_duplicates_straddling_state_expiry)."""
    e = _with_event_time(events).withColumn(
        "content_hash",
        content_hash_col("user_id", "event_type", "value", "props"),
    )
    return (
        e.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("event_id", "ts", "user_id", "event_type", "value", "content_hash")
    )


def funnel_state_machine(events: DataFrame) -> DataFrame:
    """st6: per-user view→purchase funnel via applyInPandasWithState —
    running count of views until the first purchase closes the funnel.

    State per user: (n_views, purchased). Emits one row per user per batch
    while open; final row when purchase arrives. The batch twin
    (queries/streaming_batch.stream_funnel) computes the same end-state
    relationally; equivalence on the closed-funnel rows is tested.

    100 TB notes: state is O(active users); GroupStateTimeout reaps idle
    users; Arrow batches keep the Python hop amortized.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = "user_id long, views_before_purchase long, purchased boolean"
    state_schema = "n_views long, purchased boolean"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n_views, purchased = state.get
        else:
            n_views, purchased = 0, False
        for pdf in pdfs:
            if purchased:
                break
            pdf = pdf.sort_values("ts")
            for _, row in pdf.iterrows():
                if row["event_type"] == "purchase":
                    purchased = True
                    break
                if row["event_type"] == "view":
                    n_views += 1
        state.update((n_views, purchased))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "views_before_purchase": [n_views],
                "purchased": [purchased],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """st7a: enrich the stream against a static dim (broadcast per batch)."""
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def stream_stream_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """st7b: time-bounded stream-stream join — purchases matched to a view
    by the same user within the preceding hour. Both sides watermarked;
    state on each side is bounded by watermark + join interval."""
    v = _with_event_time(views).withWatermark("ts", "10 minutes").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = _with_event_time(purchases).withWatermark("ts", "10 minutes").select(
        "user_id", F.col("ts").alias("p_ts"), "event_id"
    )
    cond = (
        (p.user_id == v.v_user)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    return p.join(v, cond, "inner").select("event_id", "user_id", "p_ts", "v_ts")


def running_user_totals(events: DataFrame) -> DataFrame:
    """st6b: per-user running (count, total value) via Spark 4's
    transformWithStateInPandas — the successor API to applyInPandasWithState
    (typed per-key state handles, timers, TTL). Emits the updated running
    state for each user every micro-batch; the end state equals the batch
    groupBy count/sum (asserted in tests).

    100 TB notes: state = one (long, double) per active user in the state
    store (RocksDB in production); no watermark needed for monotone running
    totals, add handle timers/TTL to reap idle users.

    Runtime requirement: google.protobuf (the transformWithState state-server
    protocol) — absent in some environments; the test self-skips there and
    funnel_state_machine (applyInPandasWithState) is the fallback API."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def start_parquet_upsert(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> "StreamingQuery":  # noqa: F821 — pyspark.sql.streaming type, import-light
    """st8: idempotent windowed-aggregate sink — foreachBatch + dynamic
    partition overwrite, the standard exactly-once-effect pattern for
    file/lakehouse sinks that have no transactional streaming writer.

    Each micro-batch (update mode: only groups whose aggregate changed,
    at their CURRENT cumulative value) rewrites exactly the partitions it
    touches. The partition key is the FULL aggregation key (window start ×
    event_type) — an overwrite unit coarser than the group key silently
    erases sibling groups that didn't change in that batch (a one-type
    update would wipe the window's other types; caught by the
    stream==batch test). Replaying a batch after failure rewrites the same
    partitions with the same values — idempotent by construction, which
    together with checkpointed source offsets gives end-to-end
    exactly-once EFFECT on the table.

    100 TB notes: the partition key (window start) is what makes the
    overwrite surgical — hour partitions bound each batch's rewrite to the
    windows still inside the watermark horizon, not the whole table. On a
    lakehouse table format the same foreachBatch body becomes a MERGE; the
    offsets+idempotence reasoning is unchanged."""

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        s = batch.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch.withColumn("wstart_s", F.unix_timestamp("wstart"))
            .write.mode("overwrite")
            .partitionBy("wstart_s", "event_type")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ohlc_bars(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """st9: streaming twin of queries.timeseries.ts_resample_ohlc — 6h OHLC
    bars per event_type maintained incrementally (the continuous-aggregate
    half of the hypertable-rollup pattern; ts_rollup_two_level then derives
    coarser grains from THIS layer's (sum, count) state offline).

    min_by/max_by on the (ts_us, event_id) struct are incrementally
    maintainable aggregates, so state per open (window, type) is O(1) —
    watermark closes bars 10 minutes after their window passes."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(
            F.round(
                F.min_by("value", F.struct(F.col("ts_us"), F.col("event_id"))), 2
            ).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(
                F.max_by("value", F.struct(F.col("ts_us"), F.col("event_id"))), 2
            ).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("vol"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "vol",
        )
    )


def inter_arrival_gaps(events: DataFrame) -> DataFrame:
    """st11: per-user inter-arrival gaps as a LIVE stateful stream — the
    streaming twin of x101 (events_inter_arrival): state per user is the
    last-seen (ts_us, event_id); each arriving event emits one gap row
    (ts_us delta from its predecessor), the first event of a user emits
    nothing. Downstream windowed aggregates turn the gap stream into the
    live engagement-rhythm profile; the batch twin's per-user stats over
    the SAME gaps are the equivalence check (test_streaming).

    Within a batch, events sort by (ts_us, event_id) — the identical pin
    the batch twin's lag window uses — so replaying the whole table in
    one availableNow batch reproduces the batch gaps exactly.

    100 TB notes: state is ONE (long, long) pair per active user —
    orders of magnitude lighter than buffering events; Arrow batches
    amortize the Python hop; production adds a GroupStateTimeout to reap
    users idle past the analysis horizon (NoTimeout here keeps the
    replay-equivalence test exact)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = "user_id long, event_id long, gap_us long"
    state_schema = "last_ts long, last_eid long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        last_ts, last_eid = state.get if state.exists else (None, None)
        out_eids, out_gaps = [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts_us", "event_id"]).iterrows():
                ts_us, eid = int(row["ts_us"]), int(row["event_id"])
                if last_ts is not None:
                    out_eids.append(eid)
                    out_gaps.append(ts_us - last_ts)
                last_ts, last_eid = ts_us, eid
        state.update((last_ts, last_eid))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_eids),
                "event_id": out_eids,
                "gap_us": out_gaps,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def alert_hysteresis_stream(events: DataFrame) -> DataFrame:
    """st13: LIVE Schmitt-trigger alert stream — the streaming twin of
    x139 (events_alert_hysteresis): enter the alert state above HI, leave
    below LO, count alert episodes / longest / total alert rows per user.
    State per user is FIVE integers (current state, open-run length,
    closed-episode count, longest, total) — O(1) regardless of history,
    the exact property that makes hysteresis monitoring viable on an
    unbounded stream where the batch twin's windows would buffer forever.

    Emits the running per-user summary each batch (update mode), counting
    a still-open run as an episode — identical to the batch twin's
    trailing-island semantics, so the final emit per user equals x139's
    row exactly (tested). Thresholds shared with the batch twin via the
    queries.timeseries constants.

    100 TB notes: one shuffle on user_id per batch; Arrow-amortized
    Python hop; add GroupStateTimeout to reap idle users in production
    (NoTimeout keeps replay equivalence exact)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    from ..queries.timeseries import _HYST_HI, _HYST_LO  # noqa: PLC0415

    out_schema = (
        "user_id long, n_episodes long, longest_episode long, n_alert_rows long"
    )
    state_schema = (
        "cur int, open_len long, n_closed long, longest long, total long"
    )

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        cur, open_len, n_closed, longest, total = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts_us", "event_id"]).iterrows():
                v = row["value"]
                if v > _HYST_HI:
                    cur = 1
                elif v < _HYST_LO:
                    if cur == 1 and open_len:
                        n_closed += 1
                        longest = max(longest, open_len)
                        total += open_len
                        open_len = 0
                    cur = 0
                if cur == 1:
                    open_len += 1
        state.update((cur, open_len, n_closed, longest, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_episodes": [n_closed + (1 if open_len else 0)],
                "longest_episode": [max(longest, open_len)],
                "n_alert_rows": [total + open_len],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_trending_topk(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    k: int = 2,
    watermark: str = "10 minutes",
):
    """st14: per-closed-window TRENDING top-k — the streaming half of
    stream_trending_topk (queries/streaming_batch.py). Windowed
    (window × event_type) counts run with a watermark in APPEND mode, so a
    window's rows are emitted exactly once, all together, in the single
    micro-batch where the watermark crosses its end; the foreachBatch hook
    therefore sees every type of a closed window at final counts and can
    rank STATELESSLY, appending only the top-k rows (ties broken by
    event_type asc — same total order as the batch twin).

    This is the canonical streaming-top-k shape: ranking is not a
    streaming-supported window function, but append-mode window finality
    turns it into a per-batch batch problem. Windows still open when the
    source drains (the last `watermark` of event time) are NOT emitted —
    callers compare against the batch twin under the same cutoff.

    100 TB: state = open windows × |types| partial counts (tiny);
    the rank runs on closed-window rows only, partitioned by window."""
    e = _with_event_time(events)
    counts = (
        e.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
        )
    )

    def rank_append(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.sql import Window  # noqa: PLC0415

        w = Window.partitionBy("wstart").orderBy(
            F.col("n").desc(), F.col("event_type").asc()
        )
        (
            batch.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        counts.writeStream.foreachBatch(rank_append)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def user_rate_cap_stream(events: DataFrame, cap: int = 5) -> DataFrame:
    """st15: LIVE per-user RATE CAP — the admission-control stage an event
    ingest runs in front of a training pipeline: each user may contribute
    at most `cap` events per 1h window; the rest are counted as dropped.
    Streaming twin of stream_user_rate_cap (batch, SQL-oracled). State
    per user is TWO integers (current window hour, count in it) — O(1)
    on an unbounded stream; each batch emits the RUNNING (user, window)
    admission totals, so the final emit per (user, window) equals the
    batch twin exactly (tested).

    In-order contract: decisions assume per-user event-time order (the
    staged replay is ts-ordered; production fronts this with a watermark
    reorder buffer). A late event for an already-passed window would open
    a fresh count — admission control is deliberately forward-only.

    100 TB: one shuffle on user_id per batch; Arrow-amortized Python hop;
    add GroupStateTimeout to reap idle users in production."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = "user_id long, wstart_hr long, n_events long, n_kept long"
    state_schema = "cur_hr long, n_ev long, n_kept long"
    us_per_hr = 3_600_000_000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        cur_hr, n_ev, n_kept = state.get if state.exists else (-1, 0, 0)
        touched: dict = {}
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts_us", "event_id"]).iterrows():
                hr = int(row["ts_us"]) // us_per_hr
                if hr != cur_hr:
                    cur_hr, n_ev, n_kept = hr, 0, 0
                n_ev += 1
                if n_kept < cap:
                    n_kept += 1
                touched[cur_hr] = (n_ev, n_kept)
        state.update((cur_hr, n_ev, n_kept))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(touched),
                "wstart_hr": list(touched),
                "n_events": [v[0] for v in touched.values()],
                "n_kept": [v[1] for v in touched.values()],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def window_distinct_users_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """st16: EXACT distinct users per 1h window, live — COUNT(DISTINCT) is
    not a supported streaming aggregate, but the two-stage chain
    dropDuplicates([user, window-bucket]) → windowed COUNT is: the dedup
    holds (user, window) state bounded by the watermark, and the count
    is then an ordinary incremental aggregation. This is the standard
    exact-cardinality streaming recipe; x21's HLL partials are the
    approximate alternative when per-window user state is too big.

    Emits in append mode (windows final once the watermark passes), so
    counts equal the batch twin under the watermark cutoff (tested).

    100 TB: state = live (user, window) pairs inside the watermark
    horizon + open-window counters; both shuffle on bounded keys."""
    e = _with_event_time(events)
    deduped = (
        e.withWatermark("ts", watermark)
        .withColumn("wstart", F.window("ts", "1 hour").getField("start"))
        .dropDuplicates(["user_id", "wstart"])
    )
    return (
        deduped.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_users",
        )
    )


def near_dedup_stream(
    docs: DataFrame, watermark: str = "1 hour", horizon_ms: int = 3_600_000
) -> DataFrame:
    """st17: streaming MinHash-band near-duplicate detection — the live
    twin of x95 (dedup_minhash_det), closing the last batch↔stream gap in
    the dedup taxonomy (st10 covers EXACT content dups; this covers
    near-dups). Input: a document stream (doc_id, ts, text).

    Same signature/band pipeline as the batch op (operators/minhash.py,
    shared code — the surfaces cannot drift), then stateful band buckets:
    state per (band, bkey) is the bucket's member list (doc_id, sig)
    inside the lateness horizon; each arriving doc emits one pair row per
    existing member whose signature agreement >= MHD_TAU, then joins the
    bucket. Within a micro-batch, docs apply in (ts, doc_id) order — the
    same pin the replay-equivalence test relies on.

    Delivery semantics (deliberate, documented divergences from batch):
    - AT-LEAST-ONCE pairs: a pair colliding in multiple bands emits once
      per colliding band (bands are independent state groups and cannot
      coordinate); consumers dedup on (doc_a, doc_b) — the equivalence
      test compares DISTINCT pairs against the batch twin.
    - Cap semantics: batch drops over-cap buckets wholesale (boilerplate
      df-cap); a stream cannot know final bucket size, so a full bucket
      stops ADMITTING new members (first-MHD_CAP-arrivals win). Identical
      below the cap — the tested regime.
    - Horizon: state expires via event-time timeout once the watermark
      passes last-arrival + horizon; cross-horizon near-dups are the
      batch sweep's job (same at-least-once boundary as st10).

    100 TB notes: state per bucket is <= MHD_CAP x 512 B of signature
    payload; bucket count is bounded by distinct band keys inside the
    horizon (arrival-rate x horizon, not stream length). The md5 pipeline
    runs once per doc in the narrow pre-shuffle stage; the only shuffle is
    the (band, bkey) grouping — identical topology to the batch op."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    from ..operators.minhash import MHD_CAP, MHD_K, MHD_TAU, minhash_bands  # noqa: PLC0415

    bands = minhash_bands(_with_event_time(docs), passthrough=("ts",)).select(
        "band", "bkey", "doc_id", "ts", F.concat_ws(",", "sig").alias("sig_csv")
    )
    out_schema = "doc_a long, doc_b long, est_jaccard double, band int"
    state_schema = "doc_ids array<long>, sigs array<string>"

    def update(key, pdfs, state: GroupState):
        band, _bkey = key
        doc_ids, sigs = state.get if state.exists else ([], [])
        doc_ids, sigs = list(doc_ids), list(sigs)
        known = set(doc_ids)
        out_a, out_b, out_j = [], [], []
        last_ts = None
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts", "doc_id"]).iterrows():
                did = int(row["doc_id"])
                last_ts = row["ts"]
                if did in known:
                    continue  # replayed doc: already a member, no re-emit
                sig = row["sig_csv"].split(",")
                for mid, msig_csv in zip(doc_ids, sigs):
                    msig = msig_csv.split(",")
                    agree = sum(a == b for a, b in zip(sig, msig))
                    est = round(agree / MHD_K, 6)
                    if est >= MHD_TAU:
                        a, b = (mid, did) if mid < did else (did, mid)
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(est)
                if len(doc_ids) < MHD_CAP:
                    doc_ids.append(did)
                    sigs.append(row["sig_csv"])
                    known.add(did)
        if state.hasTimedOut:
            state.remove()
        else:
            state.update((doc_ids, sigs))
            if last_ts is not None:
                # Reap the bucket once the watermark passes last-arrival +
                # horizon. Anchor on EVENT time, not current watermark: at
                # the first micro-batch the watermark is still the 1970
                # epoch, so watermark-anchored timeouts expire batch-1
                # state as soon as the watermark initializes (lost every
                # cross-batch pair touching chunk 1 before this fix). The
                # max() guard keeps the timestamp legal for late stragglers
                # whose last_ts + horizon already trails the watermark.
                ts_ms = int(pd.Timestamp(last_ts).value // 1_000_000)
                state.setTimeoutTimestamp(
                    max(ts_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(
            {
                "doc_a": pd.array(out_a, dtype="int64"),
                "doc_b": pd.array(out_b, dtype="int64"),
                "est_jaccard": pd.array(out_j, dtype="float64"),
                "band": pd.array([band] * len(out_a), dtype="int32"),
            }
        )

    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "bkey")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_psi_drift(
    events: DataFrame,
    ref: DataFrame,
    domain: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """st18: LIVE daily PSI drift vs a static reference histogram — the
    streaming half of stream_psi_daily (queries/streaming_batch.py). The
    stream maintains append-mode daily-window value histograms per
    (window, type, bucket); when the watermark closes a day, that day's
    full histogram arrives in one micro-batch and the foreachBatch hook
    scores it against the broadcast reference through the SAME kernel the
    batch twin uses (operators/psi.py — one arithmetic, no twin drift)
    and appends (day_idx, event_type, n_day, psi_u).

    This is the production online-drift-monitor shape: a model-serving
    fleet emits feature values; the monitor holds only open-day partial
    histograms (state bounded by |types| x |buckets| per open window, NOT
    by event volume) and a reference that updates out-of-band.

    Days still open when the source drains are not emitted — callers
    compare against the batch twin under the watermark cutoff."""
    e = _with_event_time(events)
    cells = (
        e.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "event_type",
            (F.round(F.col("value") * 100).cast("long") / 5000)
            .cast("long")
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c_day"))
        .select(
            (F.unix_timestamp(F.col("w.start")) / 86400)
            .cast("long")
            .alias("day_idx"),
            "event_type",
            "bucket",
            "c_day",
        )
    )

    def score_closed_days(batch: DataFrame, _batch_id: int) -> None:
        from ..operators.psi import psi_from_cells  # noqa: PLC0415

        if batch.isEmpty():
            return
        psi_from_cells(batch, ref, domain).write.mode("append").parquet(out_path)

    return (
        cells.writeStream.foreachBatch(score_closed_days)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_cms_cells(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """st19: LIVE count-min sketch maintenance — the streaming proof of
    x233's design claim that a (j, bucket, count) TABLE-form sketch is
    mergeable by plain SUM. The stream keeps append-mode daily-window
    cell counts (each event lands in _CMS_D cells via the same md5 row
    hashes as the batch op); when the watermark closes a day, its final
    cells append to the sink exactly once. The global sketch at ANY
    point is `SELECT j, bucket, SUM(c)` over the sink — no sketch-bytes
    decoding, no special merge operator, and the same query serves
    per-day, per-week, or all-time estimates by choosing which windows
    to sum (the time-partitioned-sketch pattern real monitoring stacks
    use).

    State = open windows x |types| x _CMS_D partial cells — bounded by
    the key domain, never by event volume. Days still open at drain are
    not emitted (compare under the watermark cutoff)."""
    from ..queries.aggregates import _CMS_D  # noqa: PLC0415

    e = _with_event_time(events)
    cells = (
        e.select(
            "ts",
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"),
        )
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"), F.col("j"), F.lit(":"), F.col("event_type")
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long"),
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            (F.unix_timestamp(F.col("w.start")) / 86400).cast("long").alias("day_idx"),
            "j",
            "bucket",
            "c",
        )
    )
    return (
        cells.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def ewvol_stream(events: DataFrame) -> DataFrame:
    """st20: LIVE EWMA-volatility stream — the streaming twin of x302
    (ts_ewvol): per event type, maintain the RiskMetrics recursion
    σ²′ = 0.94σ² + 0.06·d² over day-over-day count changes as days
    CLOSE on the stream. State per type is FOUR scalars (last closed
    day, its count, the previous closed day's count, σ²) — O(1)
    regardless of history, the property that lets a volatility monitor
    run forever where the batch twin re-folds the whole series.

    A day folds into σ² only when a LATER day's first event arrives
    (the day is then complete); the in-progress day rides in state.
    Same literal 0.94/0.06 coefficients and init σ²₁ = d₁² as the
    batch twin, so after the source drains the last emit per type
    equals x302's row for the last CLOSED day exactly (tested).
    Ordering: within a micro-batch rows are sorted (ts_us, event_id)
    — the x58 contract; cross-batch day order is the watermark's job.

    100 TB notes: one shuffle on event_type per micro-batch (5 keys —
    add a day-salt + merge stage if types were high-cardinality);
    Arrow-amortized Python hop; NoTimeout keeps replay equivalence."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "event_type string, day long, d_count long, sigma2 double, n_folds long"
    )
    state_schema = "cur_day long, cur_y long, prev_y long, sigma2 double, n long"

    _DAY_US = 86_400_000_000

    def update(key, pdfs, state: GroupState):
        (etype,) = key
        cur_day, cur_y, prev_y, sigma2, n = (
            state.get if state.exists else (-1, 0, -1, 0.0, 0)
        )
        emitted = []

        def close_day():
            nonlocal prev_y, sigma2, n
            if prev_y >= 0:
                d = cur_y - prev_y
                sigma2 = (
                    float(d * d) if n == 0 else 0.94 * sigma2 + 0.06 * (d * d)
                )
                n += 1
                emitted.append((cur_day, d, sigma2, n))
            prev_y = cur_y

        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts_us", "event_id"]).iterrows():
                day = int(row["ts_us"]) // _DAY_US
                if day != cur_day:
                    if cur_day >= 0:
                        close_day()
                    cur_day, cur_y = day, 0
                cur_y += 1
        state.update((cur_day, cur_y, prev_y, sigma2, n))
        if emitted:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(emitted),
                    "day": [e[0] for e in emitted],
                    "d_count": [e[1] for e in emitted],
                    "sigma2": [e[2] for e in emitted],
                    "n_folds": [e[3] for e in emitted],
                }
            )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
