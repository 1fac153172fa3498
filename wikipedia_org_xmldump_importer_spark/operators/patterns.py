"""MATCH_RECOGNIZE-style event-sequence pattern matching (SURVEY §2.13 x67,
§2.9 st11).

Spark has no MATCH_RECOGNIZE clause; this module expresses the most-used
subset — per-key, event-time-ordered patterns of the form

    STEP0+ STEP1+ ... STEP(k-2)+ STEP(k-1)

(one-or-more runs of each leading step, match CLOSED by the first event of
the final step, strict contiguity: any non-step event breaks the match,
AFTER MATCH SKIP PAST LAST ROW) — twice, from one declarative steps tuple:

* ``match_steps``          — batch, pure DataFrame ops: gaps-and-islands
  runs encoding (lag-break + running sum), one groupBy to collapse runs,
  then k-1 chained ``lead()``s over the run sequence. Everything stays in
  whole-stage codegen; the only shuffles are the per-key window and the
  run-collapse groupBy, both on the same key.
* ``match_steps_stream``   — live Structured Streaming twin via
  ``applyInPandasWithState``: O(1) state per active key (previous symbol,
  per-step run counts, match start), emits a row the moment the closing
  event arrives. The two are asserted equivalent in
  tests/test_streaming.py on replayed + adversarial cross-batch fixtures.

100 TB notes: the batch form shuffles the corpus once on the key; the runs
table it windows over is |runs| ≤ |events| rows and collapses further
before the lead()s. The streaming form's state is a few ints per ACTIVE
key (reaped by timeout in production); emission is append-mode. Skew: a
single hot key serializes its own run sequence (inherent to per-key order)
but nothing else — keys are independent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default registered pattern: browse -> engage -> convert
DEFAULT_STEPS = ("view", "click", "purchase")


def match_steps(
    events: DataFrame, steps: tuple[str, ...] = DEFAULT_STEPS
) -> DataFrame:
    """Batch matcher. ``events`` needs (user_id, event_id, event_type,
    ts_us). Returns one row per match: user_id, match_start_us,
    match_end_us (ts of the closing event), n_<step> run lengths for the
    k-1 leading steps, span_us."""
    k = len(steps)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    brk = (
        F.when(F.lag("event_type").over(w) == F.col("event_type"), F.lit(0))
        .otherwise(F.lit(1))
    )
    r = (
        events.select("user_id", "event_id", "event_type", "ts_us")
        .withColumn("brk", brk)
        .withColumn(
            "run_id",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    runs = r.groupBy("user_id", "run_id", "event_type").agg(
        F.count("*").alias("n"), F.min("ts_us").alias("start_us")
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    cols = [
        F.col("event_type").alias("t0"),
        F.col("n").alias("n0"),
        F.col("start_us").alias("s0"),
    ]
    for i in range(1, k):
        cols += [
            F.lead("event_type", i).over(w2).alias(f"t{i}"),
            F.lead("n", i).over(w2).alias(f"n{i}"),
            F.lead("start_us", i).over(w2).alias(f"s{i}"),
        ]
    seq = runs.select("user_id", *cols)
    cond: Column = reduce(
        lambda a, b: a & b, [F.col(f"t{i}") == steps[i] for i in range(k)]
    )
    return seq.filter(cond).select(
        "user_id",
        F.col("s0").alias("match_start_us"),
        F.col(f"s{k - 1}").alias("match_end_us"),
        *[F.col(f"n{i}").alias(f"n_{steps[i]}") for i in range(k - 1)],
        (F.col(f"s{k - 1}") - F.col("s0")).alias("span_us"),
    )


def advance_state(steps, prev, counts, match_start, sym, ts_us):
    """One transition of the pattern state machine. Pure function shared by
    the streaming operator (and unit-testable without Spark). Returns
    (prev, counts, match_start, emitted_row_or_None)."""
    k = len(steps)
    emit = None
    if sym == steps[0]:
        if prev == steps[0] and counts[0] > 0:
            counts[0] += 1
        else:
            counts = [0] * (k - 1)
            counts[0] = 1
            match_start = ts_us
    elif sym in steps[1:-1]:
        i = steps.index(sym)
        if prev == sym and counts[i] > 0:
            counts[i] += 1
        elif prev == steps[i - 1] and counts[i - 1] > 0:
            counts[i] = 1
        else:
            counts = [0] * (k - 1)
    elif sym == steps[-1]:
        if prev == steps[-2] and all(c > 0 for c in counts):
            emit = (match_start, ts_us, *counts, ts_us - match_start)
        counts = [0] * (k - 1)  # skip past last row
    else:
        counts = [0] * (k - 1)
    return sym, counts, match_start, emit


def match_steps_stream(
    events: DataFrame, steps: tuple[str, ...] = DEFAULT_STEPS
) -> DataFrame:
    """st11: live twin — emits each match the moment its closing event
    arrives. State per key: (prev symbol, k-1 run counts, match start).
    Counts ride as CSV text so the state schema stays fixed-width for any
    pattern length."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    k = len(steps)
    out_cols = (
        ["user_id", "match_start_us", "match_end_us"]
        + [f"n_{s}" for s in steps[:-1]]
        + ["span_us"]
    )
    out_schema = ", ".join(f"{c} long" for c in out_cols)
    state_schema = "prev_sym string, counts_csv string, match_start long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            prev, counts_csv, match_start = state.get
            counts = [int(x) for x in counts_csv.split(",")]
        else:
            prev, counts, match_start = None, [0] * (k - 1), 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts_us, sym in zip(pdf["ts_us"], pdf["event_type"]):
                prev, counts, match_start, emit = advance_state(
                    steps, prev, counts, match_start, sym, int(ts_us)
                )
                if emit is not None:
                    out.append((user_id, *emit))
        state.update((prev, ",".join(map(str, counts)), match_start))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return events.select(
        "user_id", "event_id", "event_type", "ts_us"
    ).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
