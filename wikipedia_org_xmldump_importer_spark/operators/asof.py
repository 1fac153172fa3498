"""As-of join composite (SURVEY.md §2.3 j7, §4.3).

Spark SQL 4.1 has no native ASOF JOIN. This implements the classic
union-and-window composite:

  1. Tag the right (reference) side 0 and the left (probe) side 1.
  2. Union on the join key + ordering column.
  3. Window per key ordered by (time, side, tiebreak): ``last(right_value,
     ignorenulls)`` over ``rowsBetween(unboundedPreceding, currentRow)``
     carries the most recent right-side value forward onto each probe row.
  4. Keep probe rows only.

Ties: a right row at exactly t sorts *before* a probe row at t (side 0 < 1),
so the match condition is ``right.ts <= probe.ts`` — identical to DuckDB's
``ASOF JOIN ... ON r.ts <= p.ts`` semantics. Among multiple right rows with
identical (key, ts), the carried *value column* is made deterministic by a
final tiebreak ordering on the right side's unique id.

100 TB notes: one shuffle on the join key (same as a sort-merge join would
cost), then a linear per-partition window pass — no range-join blowup and no
per-key crossJoin. Skewed keys behave like any window skew: mitigate by
salting the key + two-phase carry if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    carry: dict[str, str],
    ref_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach the reference row with the greatest
    ``ref_ts <= probe_ts`` (``direction="backward"``, the default) or the
    smallest ``ref_ts >= probe_ts`` (``direction="forward"``) within the
    same ``key`` group (left-outer: probe rows with no match get nulls).

    Forward mode mirrors the backward carry exactly: the reference side
    sorts AFTER a tied probe row (side flag), the frame flips to
    [currentRow, unboundedFollowing], and ``first(..., ignorenulls)``
    replaces ``last`` — so ``ref_ts == probe_ts`` matches in both modes,
    matching DuckDB's ``ASOF JOIN ... ON r.ts >= p.ts``. Same one-shuffle
    / linear-window cost shape in either direction.

    ``carry`` maps reference column -> output alias.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    probe_cols = probe.columns

    ref_sel: list[Column] = [
        F.col(key).alias("__key"),
        F.col(ref_ts).alias("__ts"),
        F.lit(1 if fwd else 0).alias("__side"),
    ]
    for src, _alias in carry.items():
        ref_sel.append(F.col(src).alias(f"__carry_{_alias}"))
    tiebreak = F.col(ref_tiebreak) if ref_tiebreak else F.lit(0)
    ref_sel.append(tiebreak.cast("long").alias("__tb"))
    ref_side = reference.select(*ref_sel)

    probe_sel: list[Column] = [
        F.col(key).alias("__key"),
        F.col(probe_ts).alias("__ts"),
        F.lit(0 if fwd else 1).alias("__side"),
        *[F.lit(None).cast(ref_side.schema[f"__carry_{a}"].dataType).alias(f"__carry_{a}")
          for a in carry.values()],
        F.lit(0).cast("long").alias("__tb"),
        *[F.col(c) for c in probe_cols],
    ]
    # reference side gets null probe columns
    ref_side = ref_side.select(
        "*", *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols]
    )
    unioned = ref_side.unionByName(probe.select(*probe_sel))

    base = Window.partitionBy("__key").orderBy(
        F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()
    )
    w = (
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        if fwd
        else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_side_flag = 1 if fwd else 0
    pick = F.first if fwd else F.last
    # Each carry value rides inside a struct whose outer nullability marks
    # "is this a reference row", so pick(..., ignorenulls) skips PROBE rows
    # only — a legitimately-NULL carry value on the nearest reference row is
    # preserved (a bare pick(when(...), ignorenulls) would skip that row and
    # silently carry a farther one, diverging from ASOF semantics on nullable
    # carry columns).
    carried = unioned.select(
        "*",
        *[
            pick(
                F.when(
                    F.col("__side") == ref_side_flag,
                    F.struct(F.col(f"__carry_{a}").alias("v")),
                ),
                ignorenulls=True,
            )
            .over(w)
            .getField("v")
            .alias(a)
            for a in carry.values()
        ],
    )
    return carried.filter(F.col("__side") == (1 - ref_side_flag)).select(
        *probe_cols, *carry.values()
    )
