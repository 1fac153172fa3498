"""Linear-time EWMA volatility kernel — the scale path x302 ``ts_ewvol``
names in its 100 TB note (queries/timeseries.py).

The registered form computes the sigma^2 trajectory as per-prefix
``aggregate()`` folds over the sorted per-type array: O(|days|^2) flat
float ops, deliberately chosen because the fold replays the recursion's
exact IEEE op sequence and is therefore bit-identical to the DuckDB
recursive-CTE oracle. That quadratic is map-local and fine to ~4e4 days
(a century); past it, this module is the documented swap: ONE
``applyInPandas`` pass per series runs the same recursion linearly —
``acc = 0.94*acc + 0.06*d_t^2`` consumes each diff once — producing
bit-identical trajectories because the linear recurrence IS the op
sequence every prefix fold replays (same multiplies, same adds, same
order; proven by tests/test_ewma_linear.py on exact equality of the
rounded output).

100 TB notes: one (type) shuffle for the lag window; each series folds
inside a single Arrow batch group — O(|days|) per type, no quadratic
anywhere; rounding stays JVM-side (Spark round on both paths) so the
equivalence never depends on numpy's half-even vs Spark's HALF_UP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["ewvol_linear"]

_LAM = 0.94


def ewvol_linear(
    spark: SparkSession, sf_dir: str, lam: float = _LAM
) -> DataFrame:
    """x302's output, linear time: per event type, the EWMA variance
    trajectory of day-over-day count changes via one applyInPandas fold.
    Same schema, same values (tests assert exact equality)."""
    from ..io import load_table  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.expr("ts_us div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type",
        "day",
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        (F.row_number().over(w) - 1).alias("i"),
    ).filter(F.col("i") >= 1)

    lam_c = float(lam)
    one_m = 1.0 - lam_c

    def _fold(pdf):
        import numpy as np  # noqa: PLC0415

        pdf = pdf.sort_values("day").reset_index(drop=True)
        dy = pdf["dy"].to_numpy(dtype=np.float64)
        s2 = np.empty(len(dy), dtype=np.float64)
        if len(dy):
            acc = dy[0] * dy[0]
            s2[0] = acc
            for t in range(1, len(dy)):
                # the exact op sequence of the prefix fold / recursive CTE
                acc = lam_c * acc + one_m * (dy[t] * dy[t])
                s2[t] = acc
        out = pdf[["event_type", "day", "dy"]].copy()
        out["s2"] = s2
        return out

    traj = d.groupBy("event_type").applyInPandas(
        _fold, schema="event_type string, day long, dy long, s2 double"
    )
    # round JVM-side so both the quadratic and linear paths share Spark's
    # HALF_UP — numpy would round half-even and could drift a boundary
    return traj.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("dy").cast("long").alias("d_count"),
        F.round(F.col("s2"), 6).alias("sigma2"),
        F.round(F.sqrt(F.col("s2")), 6).alias("ew_vol"),
    )
