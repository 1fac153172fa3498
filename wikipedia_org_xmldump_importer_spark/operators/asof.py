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
) -> DataFrame:
    """For each probe row, attach the reference row with the greatest
    ``ref_ts <= probe_ts`` within the same ``key`` group (left-outer: probe
    rows with no earlier reference row get nulls).

    ``carry`` maps reference column -> output alias.
    """
    probe_cols = probe.columns

    ref_sel: list[Column] = [
        F.col(key).alias("__key"),
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    ]
    for src, _alias in carry.items():
        ref_sel.append(F.col(src).alias(f"__carry_{_alias}"))
    tiebreak = F.col(ref_tiebreak) if ref_tiebreak else F.lit(0)
    ref_sel.append(tiebreak.cast("long").alias("__tb"))
    ref_side = reference.select(*ref_sel)

    probe_sel: list[Column] = [
        F.col(key).alias("__key"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
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

    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Each carry value rides inside a struct whose outer nullability marks
    # "is this a reference row", so last(..., ignorenulls) skips PROBE rows
    # only — a legitimately-NULL carry value on the latest reference row is
    # preserved (a bare last(when(...), ignorenulls) would skip that row and
    # silently carry an older one, diverging from ASOF semantics on nullable
    # carry columns).
    carried = unioned.select(
        "*",
        *[
            F.last(
                F.when(
                    F.col("__side") == 0,
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
    return carried.filter(F.col("__side") == 1).select(*probe_cols, *carry.values())
