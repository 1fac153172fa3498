"""Invariants for the x139-x141 operator batch: hysteresis state-machine
semantics, conversion-latency ordering, Matryoshka norm-retention bounds.
All at sf0.001 (smoke grain)."""

from __future__ import annotations

import math

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.queries.llm import (
    _TRUNC_DIMS,
    vec_truncate_retention,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    _HYST_HI,
    _HYST_LO,
    events_alert_hysteresis,
    events_time_to_convert,
)


def test_hysteresis_matches_sequential_replay(spark):
    """The windowed carry-forward must equal a literal per-user sequential
    replay of the Schmitt trigger (enter > HI, leave < LO)."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        state, runs, cur = 0, [], 0
        for r in rows:
            if r.value > _HYST_HI:
                state = 1
            elif r.value < _HYST_LO:
                state = 0
            if state == 1:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if runs:
            expect[uid] = (len(runs), max(runs), sum(runs))
    got = {
        r.user_id: (r.n_episodes, r.longest_episode, r.n_alert_rows)
        for r in events_alert_hysteresis(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_hysteresis_debounces_midband_oscillation(spark):
    """Values oscillating strictly between LO and HI must never flip the
    state: a synthetic user whose values stay in (LO, HI) after one HI
    crossing yields exactly ONE episode spanning every subsequent row."""
    mid = (_HYST_HI + _HYST_LO) // 2
    rows = [(1, i, float(_HYST_HI + 1 if i == 0 else mid + (i % 2))) for i in range(9)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    df = df.withColumn("ts", F.timestamp_seconds(F.col("event_id") + 1_600_000_000))
    import wikipedia_org_xmldump_importer_spark.queries.timeseries as ts_mod

    orig = ts_mod.load_table
    ts_mod.load_table = lambda *_a, **_k: df
    try:
        out = events_alert_hysteresis(spark, "ignored").collect()
    finally:
        ts_mod.load_table = orig
    assert len(out) == 1
    assert out[0].n_episodes == 1 and out[0].n_alert_rows == 9


def test_time_to_convert_gaps_positive_and_bounded(spark):
    """Every cohort's median gap is strictly positive (purchase strictly
    after first view) and cohort counts sum to at most the distinct users
    with a view event."""
    out = events_time_to_convert(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    n_viewers = (
        ev.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert sum(r.n_converted for r in out) <= n_viewers
    for r in out:
        assert r.median_gap_us > 0


def test_trunc_retention_bounds_and_full_slice_identity(spark):
    """Retention is in (0, 1]; a truncation at the full dimensionality
    retains exactly 1.0; the value matches a python recompute."""
    out = {r.vec_id: r.retention for r in vec_truncate_retention(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    for r in emb:
        v = [float(x) for x in r.embedding]
        full = math.sqrt(sum(x * x for x in v))
        head = math.sqrt(sum(x * x for x in v[:_TRUNC_DIMS]))
        assert 0.0 < out[r.vec_id] <= 1.0
        assert abs(out[r.vec_id] - head / full) < 1e-5
        if len(v) <= _TRUNC_DIMS:
            assert out[r.vec_id] == 1.0
