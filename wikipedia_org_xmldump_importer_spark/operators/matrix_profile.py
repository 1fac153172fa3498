"""Diagonal-recurrence matrix-profile kernel — the STOMP-class scale path
x315 ``ts_matrix_profile`` names in its 100 TB note
(queries/timeseries.py).

The registered form materializes the O(m^2) subsequence-pair join through
Spark (correct, oracle-checkable, fine at day grain). This module is the
documented swap for long series: per type, ONE applyInPandas group runs
the all-pairs computation DIAGONAL BY DIAGONAL — for offset k, the
distance vector d2(i, i+k) is a 7-wide sliding sum over the squared
element difference of the series against its own k-shift, one cumsum per
diagonal — O(m) memory, O(m^2) flat int64 numpy ops instead of O(m^2)
rows through a join. Distances stay EXACT int64 (the x315 un-normalized
contract), so nearest-neighbor argmins, tie-breaks and both flags are
integer-identical to the join form: tests/test_matrix_profile_kernel.py
asserts row-for-row equality.

100 TB notes: one (type) shuffle for the daily collapse; each series
folds inside its own Arrow batch group. Memory per group is O(m) — the
best-distance/best-neighbor vectors plus one diagonal — never the m x m
matrix; a century of days (~4e4) is ~3 GB of flat ops per type, trivially
within an executor core's budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["matrix_profile_linear_memory", "profile_daily"]

_W = 7
_EXCL = 4  # |i - j| >= ceil(w/2), the x315 trivial-match exclusion


def matrix_profile_linear_memory(
    spark: SparkSession, sf_dir: str, w: int = _W, excl: int = _EXCL
) -> DataFrame:
    """x315's output via the diagonal recurrence: per event type, every
    w-day subsequence's exact squared distance to its nearest non-trivial
    neighbor, plus motif/discord flags. Same schema, same values."""
    from ..io import load_table  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.expr("ts_us div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    return profile_daily(daily, w=w, excl=excl)


def profile_daily(daily: DataFrame, w: int = _W, excl: int = _EXCL) -> DataFrame:
    """The kernel proper, over any (event_type, day, y) daily frame —
    exposed separately so synthetic-series tests drive the exact
    production code path."""

    def _profile(pdf):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = pdf["day"].to_numpy(dtype=np.int64)  # day axis
        v = pdf["y"].to_numpy(dtype=np.int64)  # values
        m = len(v)
        n_sub = m - (w - 1)
        if n_sub < excl + 1:
            # typed empty frame — Arrow needs real dtypes even for 0 rows
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "day": pd.Series(dtype="int64"),
                    "nn_day": pd.Series(dtype="int64"),
                    "mp_dist2": pd.Series(dtype="int64"),
                    "is_motif": pd.Series(dtype="int32"),
                    "is_discord": pd.Series(dtype="int32"),
                }
            )
        big = np.iinfo(np.int64).max
        best_d = np.full(n_sub, big, dtype=np.int64)
        best_j = np.full(n_sub, n_sub, dtype=np.int64)  # 0-based nn index

        def _update(idx, cand_d, cand_j):
            # (d2 asc, j asc) tie-break — the x315 row_number contract
            better = (cand_d < best_d[idx]) | (
                (cand_d == best_d[idx]) & (cand_j < best_j[idx])
            )
            best_d[idx] = np.where(better, cand_d, best_d[idx])
            best_j[idx] = np.where(better, cand_j, best_j[idx])

        for k in range(excl, n_sub):
            diff = v[: m - k] - v[k:]
            sq = diff * diff
            cs = np.concatenate(([0], np.cumsum(sq)))
            d2 = cs[w:] - cs[: len(sq) - w + 1]  # d2[i] = dist(i, i+k)
            i = np.arange(len(d2), dtype=np.int64)
            # forward direction i -> j=i+k: candidates arrive j-ascending
            _update(i, d2, i + k)
            # reverse direction j -> i
            _update(i + k, d2, i)

        # For excl+1 <= n_sub < 2*excl the middle indices i in
        # [n_sub-excl, excl) have NO partner with |i-j| >= excl: the
        # diagonal loop never touches them, so best_d is still the
        # sentinel. The join form emits no row for such indices — drop
        # them here too, and pick motif/discord among survivors only.
        valid = best_d != big
        if not valid.any():
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "day": pd.Series(dtype="int64"),
                    "nn_day": pd.Series(dtype="int64"),
                    "mp_dist2": pd.Series(dtype="int64"),
                    "is_motif": pd.Series(dtype="int32"),
                    "is_discord": pd.Series(dtype="int32"),
                }
            )
        # motif: (d2 asc, i asc); discord: (d2 desc, i asc)
        order = np.flatnonzero(valid)
        motif = min(order, key=lambda i: (best_d[i], i))
        discord = min(order, key=lambda i: (-best_d[i], i))
        et = pdf["event_type"].iloc[0]
        return pd.DataFrame(
            {
                "event_type": et,
                "day": y[:n_sub][valid],
                "nn_day": y[best_j[valid]],
                "mp_dist2": best_d[valid],
                "is_motif": (order == motif).astype("int32"),
                "is_discord": (order == discord).astype("int32"),
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        _profile,
        schema=(
            "event_type string, day long, nn_day long, mp_dist2 long, "
            "is_motif int, is_discord int"
        ),
    )
