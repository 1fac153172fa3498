"""Shared PSI-from-histogram-cells kernel (x230's device at daily grain).

Used by BOTH the registered batch twin (queries/streaming_batch.py
``stream_psi_daily``) and the live streaming epilogue
(streaming/ops.py ``start_psi_drift``) so stream==batch equivalence tests
exercise one arithmetic, not two copies that could drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_SMOOTH_B = 10  # Laplace smoothing denominator add (x230's constant)


def psi_from_cells(
    cells: DataFrame, ref: DataFrame, domain: DataFrame
) -> DataFrame:
    """Daily PSI vs a static reference histogram.

    cells:  (day_idx, event_type, bucket, c_day) — per-day histograms
    ref:    (event_type, bucket, c_ref)          — reference histogram
    domain: (event_type, bucket)                 — full bucket domain

    Returns (day_idx, event_type, n_day, psi_u): PSI in integer micro-nats
    per (day, type). Smoothed shares pin to 6dp before ln; each term
    rounds to micro-units; the per-group sum is exact integers (x113).
    Only (day, type) pairs with >= 1 event appear — the same finality the
    streaming half has.
    """
    nref = ref.groupBy("event_type").agg(F.sum("c_ref").alias("n_ref"))
    nday = cells.groupBy("day_idx", "event_type").agg(
        F.sum("c_day").alias("n_day")
    )
    grid = nday.join(F.broadcast(domain), "event_type")
    joined = (
        grid.join(cells, ["day_idx", "event_type", "bucket"], "left")
        .join(F.broadcast(ref), ["event_type", "bucket"], "left")
        .join(F.broadcast(nref), "event_type")
        .select(
            "day_idx",
            "event_type",
            "n_day",
            F.coalesce("c_day", F.lit(0)).alias("c_day"),
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            "n_ref",
        )
    )
    s_day = F.round(
        (F.col("c_day") + 1).cast("double") / (F.col("n_day") + PSI_SMOOTH_B), 6
    )
    s_ref = F.round(
        (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + PSI_SMOOTH_B), 6
    )
    terms = joined.select(
        "day_idx",
        "event_type",
        "n_day",
        F.round((s_day - s_ref) * F.log(s_day / s_ref) * 1_000_000)
        .cast("long")
        .alias("t_u"),
    )
    return terms.groupBy("day_idx", "event_type").agg(
        F.max("n_day").cast("long").alias("n_day"),
        F.sum("t_u").cast("long").alias("psi_u"),
    )
