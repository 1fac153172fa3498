"""Batch-equivalence harness for the Structured Streaming surface
(SURVEY §5.3): replay events as ordered micro-batches with availableNow,
assert stream result == batch result, plus targeted late-event and
duplicate-id fixtures for st4/st5."""

from __future__ import annotations

import pandas as pd
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.sources.stream_events import (
    read_event_stream,
    run_to_completion,
    stage_event_chunks,
)
from wikipedia_org_xmldump_importer_spark.streaming import ops


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def _assert_stream_equals_batch(stream_result, batch_result):
    s, b = _sorted_pdf(stream_result), _sorted_pdf(batch_result)
    pd.testing.assert_frame_equal(s, b, check_dtype=False)


def _staged(spark, tmp_path) -> str:
    out = str(tmp_path / "chunks")
    stage_event_chunks(spark, SF_SMOKE, out, n_chunks=6)
    return out


def test_tumbling_stream_equals_batch(spark, tmp_path):
    staged = _staged(spark, tmp_path)
    stream = ops.tumbling_counts(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_tumbling", "complete")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["stream_tumbling"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_sliding_stream_equals_batch(spark, tmp_path):
    staged = _staged(spark, tmp_path)
    stream = ops.sliding_counts(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_sliding", "complete")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["stream_sliding"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_session_stream_equals_batch(spark, tmp_path):
    staged = _staged(spark, tmp_path)
    stream = ops.session_counts(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_session", "complete")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["stream_session"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_stream_static_join_equals_batch(spark, tmp_path):
    staged = _staged(spark, tmp_path)
    cust = load_table(spark, SF_SMOKE, "customer")
    stream = ops.stream_static_join(read_event_stream(spark, staged), cust)
    got = run_to_completion(stream, "t_ssj", "complete")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["stream_static_join"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_watermark_drops_late_events(spark, tmp_path):
    """st4: a chunk far older than the watermark horizon arrives last; its
    events must NOT reopen finalized windows in append mode."""
    staged = str(tmp_path / "late_chunks")
    stage_event_chunks(spark, SF_SMOKE, staged, n_chunks=4)
    # hand-written late chunk: events 10 days before the stream's start,
    # arriving after everything else (lexicographically-last dir name)
    ev = load_table(spark, SF_SMOKE, "events")
    late = ev.limit(5).selectExpr(
        "event_id + 1000000 AS event_id",
        "ts - INTERVAL 10 DAYS AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
        "ts_us - 864000000000 AS ts_us",
    )
    late.coalesce(1).write.mode("overwrite").parquet(staged + "/chunk_99_late")

    stream = ops.watermark_late_filter(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_late", "append").toPandas()
    late_starts = {
        r.wstart
        for r in late.selectExpr(
            "date_trunc('quarter', ts) AS q", "window(ts, '15 minutes').start AS wstart"
        ).collect()
    }
    finalized = set(got["wstart"])
    # none of the late-chunk windows may appear in the finalized output
    assert not (late_starts & finalized), (late_starts, finalized)
    assert len(got) > 0


def test_stateful_dedup_removes_duplicates(spark, tmp_path):
    """st5: replay a chunk of duplicated event_ids; dedup keeps one copy."""
    staged = str(tmp_path / "dup_chunks")
    stage_event_chunks(spark, SF_SMOKE, staged, n_chunks=4)
    ev = load_table(spark, SF_SMOKE, "events")
    # duplicate the 20 newest events (same ids, same ts -> inside watermark)
    dup = ev.orderBy("ts", ascending=False).limit(20)
    dup.coalesce(1).write.mode("overwrite").parquet(staged + "/chunk_98_dup")

    stream = ops.stateful_dedup(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_dedup", "append")
    total = got.count()
    uniq = got.select("event_id").distinct().count()
    assert total == uniq, f"{total} rows but {uniq} unique ids"
    assert uniq == ev.count()


def _write_synth_chunk(spark, staged_dir: str, name: str, rows) -> None:
    """Write one hand-placed micro-batch chunk. ``rows`` is a list of
    (event_id, 'YYYY-MM-DD HH:MM:SS', user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
        "timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ),"
        " CAST(ts_s AS TIMESTAMP_NTZ)) AS ts_us",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{staged_dir}/{name}")


def test_watermark_boundary_window_semantics(spark, tmp_path):
    """st4 adversarial: pin Spark's EXACT late-data rules for watermarked
    windowed aggregation in append mode, empirically established on this
    engine (the micro-batch watermark protocol makes them subtler than
    "older than watermark is dropped"):

      * A window is EMITTED AT MOST ONCE, in the first batch whose
        start-of-batch watermark passes its end; a late row arriving in any
        LATER batch cannot re-open it and is dropped.
      * A late row arriving in that SAME emission batch still counts: the
        late filter uses the previous batch's watermark while eviction uses
        the current one, so Spark errs toward including boundary data
        rather than dropping it (drops are best-effort per the Spark docs;
        finalization is the hard guarantee).
      * Rows older than the watermark whose window is still open (end >
        watermark) are always aggregated — lateness is judged per window,
        not per row.
    """
    staged = str(tmp_path / "boundary_chunks")
    # batch 0: occupants + a head event -> watermark 11:50 for batch 1
    _write_synth_chunk(
        spark,
        staged,
        "chunk_01",
        [
            (1, "2024-01-01 10:40:00", 1, "view", 1.0),
            (2, "2024-01-01 11:31:00", 1, "view", 1.0),
            (3, "2024-01-01 11:46:00", 1, "view", 1.0),
            (4, "2024-01-01 12:00:00", 1, "view", 1.0),  # max -> wm 11:50
        ],
    )
    # batch 1 runs with watermark 11:50: window [11:30,11:45) finalizes at
    # the END of this batch, so its late row 5 is still included
    _write_synth_chunk(
        spark,
        staged,
        "chunk_02",
        [
            # 10 min late, window end 11:45 <= wm — included (same batch)
            (5, "2024-01-01 11:40:00", 1, "view", 1.0),
            # exactly at the watermark; window [11:45, 12:00) open -> kept
            (6, "2024-01-01 11:50:00", 1, "view", 1.0),
            # OLDER than the watermark but window [11:45, 12:00) open -> kept
            (7, "2024-01-01 11:45:00", 1, "view", 1.0),
        ],
    )
    # batch 2: row 10 targets the ALREADY-EMITTED window [11:30,11:45) — it
    # must be dropped (append emitted the window in batch 1; re-opening
    # would double-report); row 8 advances the watermark past 12:00
    _write_synth_chunk(
        spark,
        staged,
        "chunk_03",
        [
            (10, "2024-01-01 11:41:00", 1, "view", 1.0),
            (8, "2024-01-01 13:00:00", 1, "view", 1.0),
        ],
    )
    # batch 3: watermark 12:50 >= 12:00 finalizes [11:45, 12:00) while
    # batches still run (no reliance on a post-stream flush)
    _write_synth_chunk(spark, staged, "chunk_04", [(9, "2024-01-01 14:00:00", 1, "view", 1.0)])

    stream = ops.watermark_late_filter(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_boundary", "append").toPandas()
    # append mode: every window appears at most once
    assert got["wstart"].is_unique, got
    counts = {str(r.wstart): int(r.n) for r in got.itertuples()}
    assert counts["2024-01-01 10:30:00"] == 1
    # row 2 (on time) + row 5 (late, emission batch) — row 10 (late, post-
    # emission batch) excluded
    assert counts["2024-01-01 11:30:00"] == 2
    # on-time row 3 + at-watermark row 6 + older-than-watermark row 7
    assert counts["2024-01-01 11:45:00"] == 3


def test_dedup_duplicates_straddling_state_expiry(spark, tmp_path):
    """st5 adversarial: dropDuplicatesWithinWatermark keeps per-id state only
    for the watermark delay (30 min). A duplicate arriving while the state
    is alive is dropped; the SAME id arriving after its state expired is
    re-emitted — the documented at-least-once boundary of bounded-state
    dedup. Also pins the row-level late filter boundary: ts == watermark is
    kept (the duplicate id=1 row arrives exactly AT the watermark and still
    re-emits), ts < watermark is dropped."""
    staged = str(tmp_path / "expiry_chunks")
    _write_synth_chunk(
        spark,
        staged,
        "chunk_01",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:05:00", 1, "view", 1.0),
            (100, "2024-01-01 10:20:00", 1, "view", 1.0),  # max -> wm 09:50
        ],
    )
    _write_synth_chunk(
        spark,
        staged,
        "chunk_02",
        [
            # duplicate id=2 while its state is alive (expiry 10:35) -> drop
            (2, "2024-01-01 10:18:00", 1, "view", 1.0),
            (101, "2024-01-01 11:40:00", 1, "view", 1.0),  # max -> wm 11:10
        ],
    )
    # spacer batch: id=1's state (expiry 10:30 < wm 11:10) is evicted at
    # this batch's cleanup; max 11:45 -> wm 11:15 for the final batch
    _write_synth_chunk(
        spark, staged, "chunk_03", [(102, "2024-01-01 11:45:00", 1, "view", 1.0)]
    )
    _write_synth_chunk(
        spark,
        staged,
        "chunk_04",
        [
            # id=1 again: state expired AND ts exactly == watermark (11:15)
            # -> not late, no state -> RE-EMITTED
            (1, "2024-01-01 11:15:00", 1, "view", 1.0),
            # new id but ts < watermark -> dropped as late, never emitted
            (4, "2024-01-01 10:00:00", 1, "view", 1.0),
        ],
    )

    stream = ops.stateful_dedup(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_expiry", "append").toPandas()
    by_id = got.groupby("event_id").size().to_dict()
    assert by_id[1] == 2, f"straddling duplicate not re-emitted: {by_id}"
    assert by_id[2] == 1, f"within-delay duplicate not dropped: {by_id}"
    assert 4 not in by_id, f"older-than-watermark row not dropped: {by_id}"
    assert by_id[100] == 1 and by_id[101] == 1 and by_id[102] == 1


def test_content_dedup_stream_equals_batch(spark, tmp_path):
    """st10: the streaming content-hash dedup (dedup_exact's streaming twin)
    must emit exactly one row per distinct content — the first seen — even
    when the duplicate arrives under a DIFFERENT event_id in a later
    micro-batch, matching the batch keep-first dedup on the same data."""
    staged = str(tmp_path / "content_chunks")
    _write_synth_chunk(
        spark,
        staged,
        "chunk_01",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:01:00", 2, "view", 1.0),
            (3, "2024-01-01 10:02:00", 1, "purchase", 5.0),
        ],
    )
    _write_synth_chunk(
        spark,
        staged,
        "chunk_02",
        [
            # same content as event 1 under a fresh id -> dropped
            (4, "2024-01-01 10:05:00", 1, "view", 1.0),
            (5, "2024-01-01 10:06:00", 3, "view", 2.0),
        ],
    )
    _write_synth_chunk(
        spark,
        staged,
        "chunk_03",
        [
            # same content as event 3 -> dropped
            (6, "2024-01-01 10:10:00", 1, "purchase", 5.0),
            (7, "2024-01-01 10:12:00", 2, "click", 3.0),
        ],
    )

    stream = ops.content_dedup(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_content_dedup", "append").toPandas()

    # batch twin: keep-first per content hash over the union of all chunks,
    # using the SAME shared hash helper as the streaming op
    batch = spark.read.parquet(f"{staged}/chunk_*")
    from pyspark.sql import Window

    h = ops.content_hash_col("user_id", "event_type", "value", "props")
    w = Window.partitionBy("content_hash").orderBy("ts", "event_id")
    want = (
        batch.withColumn("content_hash", h)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .toPandas()
    )
    assert set(got["event_id"]) == set(want["event_id"]) == {1, 2, 3, 5, 7}
    assert got["content_hash"].is_unique
    assert len(got) == len(want) == 5


def test_content_hash_injective_on_adversarial_fields(spark):
    """The hash pre-image must not collide when a field CONTAINS the
    separator or the NULL sentinel (length-prefixed tokens): 'a\\x1fb' in
    one field vs ('a','b') split across adjacent fields, and '' vs NULL."""
    rows = [
        ("a\x1fb", "c"),  # separator inside field 1
        ("a", "b\x1fc"),  # same bytes, boundary shifted
        ("", "c"),  # empty string field
        (None, "c"),  # NULL field — must differ from empty
        ("N", "c"),  # literal sentinel text as a real value
    ]
    df = spark.createDataFrame(rows, "f1 string, f2 string").select(
        ops.content_hash_col("f1", "f2").alias("h")
    )
    hashes = [r.h for r in df.collect()]
    assert len(set(hashes)) == len(hashes), hashes


def test_pattern_match_stream_equals_batch(spark, tmp_path):
    """st11/x67: the live applyInPandasWithState pattern matcher must emit
    exactly the registered batch query's matches on replayed real data."""
    from wikipedia_org_xmldump_importer_spark.operators.patterns import (
        match_steps_stream,
    )
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    staged = _staged(spark, tmp_path)
    stream = match_steps_stream(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_pattern", "append")
    want = REGISTRY["events_pattern_match"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_pattern_match_cross_batch_straddle(spark, tmp_path):
    """st11 adversarial: a match whose view/click runs end in one
    micro-batch and whose closing purchase arrives in the NEXT batch must
    still be emitted (state carries prev symbol + run counts across
    batches); a breaker event must reset; skip-past-last-row must prevent
    a second purchase from double-emitting."""
    from wikipedia_org_xmldump_importer_spark.operators.patterns import (
        match_steps,
        match_steps_stream,
    )

    staged = str(tmp_path / "pattern_chunks")
    _write_synth_chunk(
        spark,
        staged,
        "chunk_01",
        [
            # user 1: V V K | (K P in chunk 2) -> one match, n_view=2 n_click=2
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:01:00", 1, "view", 1.0),
            (3, "2024-01-01 10:02:00", 1, "click", 1.0),
            # user 2: V K error P -> breaker kills the match
            (4, "2024-01-01 10:00:00", 2, "view", 1.0),
            (5, "2024-01-01 10:01:00", 2, "click", 1.0),
            (6, "2024-01-01 10:02:00", 2, "error", 0.0),
        ],
    )
    _write_synth_chunk(
        spark,
        staged,
        "chunk_02",
        [
            (7, "2024-01-01 10:03:00", 1, "click", 1.0),
            (8, "2024-01-01 10:04:00", 1, "purchase", 9.0),
            # second purchase right after the match: skip-past-last-row
            (9, "2024-01-01 10:05:00", 1, "purchase", 9.0),
            (10, "2024-01-01 10:03:00", 2, "purchase", 9.0),
            # user 2 then completes a clean V K P -> exactly one match
            (11, "2024-01-01 10:04:00", 2, "view", 1.0),
            (12, "2024-01-01 10:05:00", 2, "click", 1.0),
            (13, "2024-01-01 10:06:00", 2, "purchase", 9.0),
        ],
    )
    stream = match_steps_stream(read_event_stream(spark, staged))
    got = _sorted_pdf(run_to_completion(stream, "t_pattern_straddle", "append"))
    batch = spark.read.parquet(f"{staged}/chunk_*")
    want = _sorted_pdf(match_steps(batch))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 2
    by_user = got.set_index("user_id")
    assert by_user.loc[1, "n_view"] == 2 and by_user.loc[1, "n_click"] == 2
    assert by_user.loc[2, "n_view"] == 1 and by_user.loc[2, "n_click"] == 1


def test_funnel_state_machine(spark, tmp_path):
    """st6: applyInPandasWithState funnel — closed funnels must agree with
    the relational batch twin."""
    staged = _staged(spark, tmp_path)
    stream = ops.funnel_state_machine(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_funnel", "update").toPandas()
    # update-mode memory sink keeps every emitted row; take the final row
    # per user (last emit wins)
    final = got.groupby("user_id").tail(1)
    closed = final[final["purchased"]]

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    batch = REGISTRY["stream_funnel"].fn(spark, SF_SMOKE).toPandas()
    merged = closed.merge(batch, on="user_id", how="inner")
    assert len(merged) == len(closed) == len(batch)
    assert (
        merged["views_before_purchase_x"] == merged["views_before_purchase_y"]
    ).all()


def test_stream_stream_join_runs(spark, tmp_path):
    """st7b: time-bounded stream-stream join executes and matches the batch
    range-join on the same data."""
    staged = _staged(spark, tmp_path)
    events = read_event_stream(spark, staged)
    views = events.filter("event_type = 'view'")
    purchases = events.filter("event_type = 'purchase'")
    got = run_to_completion(
        ops.stream_stream_join(views, purchases), "t_ssjoin", "append"
    )

    ev = load_table(spark, SF_SMOKE, "events")
    bv = ev.filter("event_type = 'view'").selectExpr(
        "user_id AS v_user", "ts AS v_ts"
    )
    bp = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id", "ts AS p_ts", "event_id"
    )
    want = bp.join(
        bv,
        (bp.user_id == bv.v_user)
        & (bv.v_ts <= bp.p_ts)
        & (bv.v_ts >= bp.p_ts - __import__("pyspark").sql.functions.expr("INTERVAL 1 HOUR")),
    ).select("event_id", "user_id", "p_ts", "v_ts")
    _assert_stream_equals_batch(got, want)


def test_processing_time_trigger_live_microbatches(spark, tmp_path):
    """Live-trigger soak: a processingTime trigger (real micro-batch clock,
    not availableNow replay) consumes chunks that arrive WHILE the query
    runs, and the final windowed counts still equal the batch twin.

    This is the only streaming surface the availableNow equivalence tests
    never exercise — the wall-clock scheduling path a production job runs
    on. Chunks are staged elsewhere and moved in one at a time (atomic
    rename, like hourly drops landing in a lake)."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import time  # noqa: PLC0415

    pre = str(tmp_path / "pre")
    live = str(tmp_path / "live")
    stage_event_chunks(spark, SF_SMOKE, pre, n_chunks=4)
    os.makedirs(live)

    stream = ops.tumbling_counts(read_event_stream(spark, live))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rate_soak")
        .outputMode("complete")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    total = load_table(spark, SF_SMOKE, "events").count()
    try:
        for d in sorted(os.listdir(pre)):
            shutil.move(os.path.join(pre, d), os.path.join(live, d))
            time.sleep(0.6)  # spread arrivals across trigger ticks

        def rows_seen() -> int:
            return sum(p["numInputRows"] for p in q.recentProgress)

        deadline = time.time() + 120
        while time.time() < deadline and rows_seen() < total:
            time.sleep(0.5)
        assert rows_seen() == total, f"consumed {rows_seen()} of {total} rows"
        # the clock trigger must have split the work into several real
        # micro-batches (availableNow replay can't produce this evidence)
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_batches) >= 2, [p["numInputRows"] for p in q.recentProgress]
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM t_rate_soak")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["stream_tumbling"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_transform_with_state_running_totals(spark, tmp_path):
    """st6b: transformWithStateInPandas end-state == batch groupBy agg.

    Requires google.protobuf at runtime (the state-server protocol);
    unavailable in this container, so the test self-skips there — the
    applyInPandasWithState funnel (st6) stays the always-tested path."""
    import pytest  # noqa: PLC0415

    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415
    except ImportError:
        pytest.skip("google.protobuf unavailable — transformWithState needs it")
    staged = _staged(spark, tmp_path)
    stream = ops.running_user_totals(read_event_stream(spark, staged))
    got = run_to_completion(stream, "twstate", output_mode="update").toPandas()
    # update mode emits one row per (user, micro-batch); the LAST row per
    # user is the end state
    final = got.groupby("user_id").last().reset_index()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    merged = final.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (abs(merged.total_value_s - merged.total_value_b) < 1e-6).all()


def test_foreach_batch_parquet_upsert_idempotent_sink(spark, tmp_path):
    """st8: the foreachBatch dynamic-partition-overwrite sink, replayed in
    micro-batches, must leave a parquet table equal to the batch twin —
    update-mode re-emissions of the same window overwrite (not duplicate)
    their partition, which is the idempotence the exactly-once effect
    rests on."""
    staged = str(tmp_path / "staged")
    stage_event_chunks(spark, SF_SMOKE, staged, n_chunks=4)
    out = str(tmp_path / "upsert_out")
    q = ops.start_parquet_upsert(
        ops.tumbling_counts(read_event_stream(spark, staged)),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    got = spark.read.parquet(out).drop("wstart_s")
    want = REGISTRY["stream_tumbling"].fn(spark, SF_SMOKE)
    _assert_stream_equals_batch(got, want)


def test_ohlc_stream_equals_batch(spark, tmp_path):
    """st9: incrementally-maintained OHLC bars == the batch downsample
    (ts_resample_ohlc). min_by/max_by state must survive micro-batch
    splits — an open/close picked inside one chunk must lose to a better
    candidate arriving in a later chunk."""
    staged = _staged(spark, tmp_path)
    stream = ops.ohlc_bars(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_ohlc", "complete")
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = REGISTRY["ts_resample_ohlc"].fn(spark, SF_SMOKE)
    # batch emits NTZ bucket, stream emits ltz under the UTC session — align
    got = got.withColumn("bucket", F.col("bucket").cast("timestamp_ntz"))
    _assert_stream_equals_batch(got, want)


def test_inter_arrival_stream_matches_batch(spark, tmp_path):
    """st11: live stateful gap stream — aggregating the emitted per-event
    gaps must reproduce the batch twin's per-user stats exactly (x101)."""
    staged = _staged(spark, tmp_path)
    got = run_to_completion(
        ops.inter_arrival_gaps(read_event_stream(spark, staged)),
        "t_gaps",
        "append",
    ).toPandas()
    agg = (
        got.groupby("user_id")
        .agg(
            n_gaps=("gap_us", "size"),
            min_gap_us=("gap_us", "min"),
            max_gap_us=("gap_us", "max"),
        )
        .reset_index()
    )

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    batch = REGISTRY["events_inter_arrival"].fn(spark, SF_SMOKE).toPandas()
    merged = agg.merge(batch, on="user_id", how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()
    assert (merged["n_gaps_x"] == merged["n_gaps_y"]).all()
    assert (merged["min_gap_us_x"] == merged["min_gap_us_y"]).all()
    assert (merged["max_gap_us_x"] == merged["max_gap_us_y"]).all()


def test_alert_hysteresis_stream_matches_batch(spark, tmp_path):
    """st13: live Schmitt-trigger summaries — the final emit per user must
    equal the batch twin x139 exactly (including open-episode counting)."""
    staged = _staged(spark, tmp_path)
    stream = ops.alert_hysteresis_stream(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_hyst", "update").toPandas()
    final = got.groupby("user_id").tail(1)
    final = final[final["n_episodes"] > 0]

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    batch = REGISTRY["events_alert_hysteresis"].fn(spark, SF_SMOKE).toPandas()
    merged = final.merge(batch, on="user_id", how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()
    for col in ("n_episodes", "longest_episode", "n_alert_rows"):
        assert (merged[f"{col}_x"] == merged[f"{col}_y"]).all()


def test_trending_topk_stream_equals_batch(spark, tmp_path):
    """st14: per-closed-window top-k from append-mode foreachBatch ranking
    must equal the batch twin for every window the watermark closed
    (windows still open when the source drains are legitimately absent)."""
    staged = _staged(spark, tmp_path)
    out = str(tmp_path / "trending_out")
    ckpt = str(tmp_path / "trending_ckpt")
    q = ops.start_trending_topk(read_event_stream(spark, staged), out, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out)

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    # final watermark = max event time − 10 min; only windows whose end is
    # at or before it were closed and emitted
    max_ts = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.max("ts").alias("m"))
        .collect()[0]
        .m
    )
    cutoff = max_ts - __import__("datetime").timedelta(minutes=10)
    want = (
        REGISTRY["stream_trending_topk"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("wend") <= F.lit(cutoff))
    )
    got = got.withColumn("wstart", F.col("wstart").cast("timestamp_ntz")).withColumn(
        "wend", F.col("wend").cast("timestamp_ntz")
    )
    assert got.count() > 0
    _assert_stream_equals_batch(got, want)


def test_user_rate_cap_stream_equals_batch(spark, tmp_path):
    """st15: the live admission counters' final emit per (user, window)
    must equal the batch twin's keep-first-N totals."""
    staged = _staged(spark, tmp_path)
    got = run_to_completion(
        ops.user_rate_cap_stream(read_event_stream(spark, staged)),
        "t_ratecap",
        "update",
    ).toPandas()
    final = (
        got.sort_index()
        .groupby(["user_id", "wstart_hr"])
        .tail(1)
        .reset_index(drop=True)
    )

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    batch = REGISTRY["stream_user_rate_cap"].fn(spark, SF_SMOKE).toPandas()
    merged = final.merge(
        batch, on=["user_id", "wstart_hr"], how="outer", indicator=True
    )
    assert (merged["_merge"] == "both").all()
    assert (merged["n_events_x"] == merged["n_events_y"]).all()
    assert (merged["n_kept_x"] == merged["n_kept_y"]).all()
    assert (merged["n_kept_y"] <= 5).all()


def test_window_distinct_users_stream_equals_batch(spark, tmp_path):
    """st16: the dedupe→count chain's closed windows must equal the batch
    twin's exact distinct counts under the watermark cutoff, even when a
    user's duplicate arrivals for one window span micro-batches."""
    staged = _staged(spark, tmp_path)
    stream = ops.window_distinct_users_stream(read_event_stream(spark, staged))
    got = run_to_completion(stream, "t_wdu", "append")

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    max_ts = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.max("ts").alias("m"))
        .collect()[0]
        .m
    )
    cutoff = max_ts - __import__("datetime").timedelta(minutes=10)
    want = (
        REGISTRY["stream_window_distinct_users"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("wend") <= F.lit(cutoff))
    )
    got = got.withColumn("wstart", F.col("wstart").cast("timestamp_ntz")).withColumn(
        "wend", F.col("wend").cast("timestamp_ntz")
    )
    assert got.count() > 0
    _assert_stream_equals_batch(got, want)


def test_near_dedup_stream_matches_batch(spark, tmp_path):
    """st17: streaming MinHash-band near-dup == batch dedup_minhash_det on
    DISTINCT pairs (the stream is at-least-once per colliding band by
    declaration; batch applies a global distinct). All arrivals fit inside
    the 1h horizon here, so no state expires mid-replay and the pair sets
    must agree exactly — including est_jaccard values, which both surfaces
    compute from the same shared signature code (operators/minhash.py)."""
    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded
    from wikipedia_org_xmldump_importer_spark.sources.stream_events import (
        read_document_stream,
        stage_document_chunks,
    )

    _ensure_loaded()
    staged = str(tmp_path / "doc_chunks")
    stage_document_chunks(spark, SF_SMOKE, staged, n_chunks=5)
    stream = ops.near_dedup_stream(read_document_stream(spark, staged))
    got = (
        run_to_completion(stream, "t_near_dedup", "append")
        .select("doc_a", "doc_b", "est_jaccard")
        .distinct()
    )
    want = REGISTRY["dedup_minhash_det"].fn(spark, SF_SMOKE)
    assert got.count() > 0, "fixture produced no near-dup pairs — test is vacuous"
    _assert_stream_equals_batch(got, want)


def test_near_dedup_stream_pair_emitted_once_per_band(spark, tmp_path):
    """Adversarial fixture: two near-identical docs + one unrelated doc,
    split across micro-batches so the pair forms cross-batch via bucket
    STATE (not within one pandas group). The pair may appear once per
    colliding band but never twice for the same band (members join a
    bucket exactly once), and the unrelated doc pairs with nothing."""
    import os

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows1 = [(1, "2024-01-01 00:00:01", base)]
    rows2 = [
        (2, "2024-01-01 00:00:02", base + " phi"),
        (9, "2024-01-01 00:00:03", "completely different words entirely here now"),
    ]
    staged = str(tmp_path / "adv_chunks")
    for i, rows in enumerate((rows1, rows2), start=1):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        df = spark.createDataFrame(pdf).select(
            F.col("doc_id").cast("long"),
            F.col("ts").cast("timestamp_ntz"),
            "text",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(staged, f"chunk_{i:02d}")
        )
    from wikipedia_org_xmldump_importer_spark.sources.stream_events import (
        read_document_stream,
    )

    stream = ops.near_dedup_stream(read_document_stream(spark, staged))
    got = run_to_completion(stream, "t_near_dedup_adv", "append").toPandas()
    assert set(zip(got.doc_a, got.doc_b)) == {(1, 2)}
    # once per band at most: band values unique for the pair
    assert got.band.is_unique
    assert (got.est_jaccard >= 0.5).all()


def test_psi_drift_stream_equals_batch(spark, tmp_path):
    """st18: per-closed-day PSI from append-mode daily histograms scored
    in foreachBatch through the shared kernel must equal the batch twin
    for every day the watermark closed."""
    staged = _staged(spark, tmp_path)
    out = str(tmp_path / "psi_out")
    ckpt = str(tmp_path / "psi_ckpt")

    # reference + domain exactly as the batch twin builds them
    ev = load_table(spark, SF_SMOKE, "events")
    base = ev.select(
        (F.col("ts_us") / 86_400_000_000).cast("long").alias("day_idx"),
        "event_type",
        (F.round(F.col("value") * 100).cast("long") / 5000)
        .cast("long")
        .alias("bucket"),
        F.dayofmonth("ts").alias("dom"),
    )
    ref = (
        base.filter(F.col("dom") <= 7)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    domain = (
        base.select("event_type", "bucket")
        .distinct()
        .union(ref.select("event_type", "bucket"))
        .distinct()
    )
    q = ops.start_psi_drift(read_event_stream(spark, staged), ref, domain, out, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() > 0

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    max_ts_us = ev.agg(F.max("ts_us").alias("m")).collect()[0].m
    cutoff_us = max_ts_us - 10 * 60 * 1_000_000
    # a day is closed when its window END <= watermark
    closed_day_max = cutoff_us // 86_400_000_000 - 1
    want = (
        REGISTRY["stream_psi_daily"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("day_idx") <= closed_day_max)
    )
    _assert_stream_equals_batch(got, want)


def test_cms_cells_stream_merges_to_batch_sketch(spark, tmp_path):
    """st19: SUM over the streamed per-day cells must equal the batch CMS
    cells over the closed-day events, and the resulting point estimates
    must match the batch construction — the mergeable-by-SUM property,
    live."""
    import hashlib

    staged = _staged(spark, tmp_path)
    out = str(tmp_path / "cms_out")
    ckpt = str(tmp_path / "cms_ckpt")
    q = ops.start_cms_cells(read_event_stream(spark, staged), out, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() > 0

    merged = {
        (r.j, r.bucket): r.total
        for r in got.groupBy("j", "bucket")
        .agg(F.sum("c").alias("total"))
        .collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    max_ts_us = ev.agg(F.max("ts_us").alias("m")).collect()[0].m
    closed_day_max = (max_ts_us - 10 * 60 * 1_000_000) // 86_400_000_000 - 1
    closed = ev.filter(
        (F.col("ts_us") / 86_400_000_000).cast("long") <= closed_day_max
    )
    tc = {
        r.event_type: r.n
        for r in closed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expect: dict = {}
    for t, n in tc.items():
        for j in range(4):
            b = int(hashlib.md5(f"cms{j}:{t}".encode()).hexdigest()[:2], 16)
            expect[(j, b)] = expect.get((j, b), 0) + n
    assert merged == expect
    # point estimates from the merged stream cells == batch CMS estimates
    for t, n in tc.items():
        est = min(
            merged[(j, int(hashlib.md5(f"cms{j}:{t}".encode()).hexdigest()[:2], 16))]
            for j in range(4)
        )
        assert est >= n


def test_ewvol_stream_matches_batch(spark, tmp_path):
    """st20: live EWMA-volatility — every day the stream CLOSED must carry
    exactly the batch twin x302's (d_count, sigma2) for that day; the one
    legitimately absent row per type is the final observed day (it never
    closes on a drained source)."""
    staged = _staged(spark, tmp_path)
    got = run_to_completion(
        ops.ewvol_stream(read_event_stream(spark, staged)),
        "t_ewvol",
        "append",
    ).toPandas()

    from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    batch = REGISTRY["ts_ewvol"].fn(spark, SF_SMOKE).toPandas()
    last_day = batch.groupby("event_type")["day"].max()
    merged = got.merge(batch, on=["event_type", "day"], how="outer", indicator=True)
    # stream-only rows must not exist; batch-only rows are exactly the
    # per-type final days
    assert not (merged["_merge"] == "left_only").any()
    batch_only = merged[merged["_merge"] == "right_only"]
    assert set(zip(batch_only["event_type"], batch_only["day"])) == set(
        last_day.items()
    )
    both = merged[merged["_merge"] == "both"]
    assert (both["d_count_x"] == both["d_count_y"]).all()
    assert (both["sigma2_x"] - both["sigma2_y"]).abs().max() < 2e-6
    # fold counter is the per-type day index (1-based over closed days)
    n_per_type = got.groupby("event_type")["n_folds"].max()
    rows_per_type = got.groupby("event_type").size()
    assert (n_per_type == rows_per_type).all()
