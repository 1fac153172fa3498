"""Distributed MERGE / slowly-changing-dimension composites.

The reference class's load step is "truncate-or-upsert" into the destination
database (SURVEY.md §1.2 [K]): a fresh dump either replaces the page table or
upserts changed pages into it. A Spark-native engine can't rely on the
destination DB's ``ON CONFLICT`` — the merge itself must be a distributed
plan. These composites are that plan, usable both for the importer's
incremental-dump story (adds-changes dumps merged into the page snapshot)
and as general SCD1/SCD2 operators.

100 TB notes:

* ``merge_upsert`` is one full-outer shuffle join on the merge key. If the
  base snapshot is bucketed on the key (io.sink_bucketed), the base side
  reads pre-shuffled and only the (much smaller) delta shuffles; with AQE
  the delta side broadcast-joins when it fits. Rewriting only changed
  partitions (partitionBy date/namespace + dynamic partition overwrite,
  streaming/ops.py st8) bounds the write amplification.
* ``scd2_snapshot`` is one window (partition by key, order by ts): the
  classic valid_from/valid_to derivation. No self-join, no second shuffle —
  `lead()` over the sorted partition carries the successor's timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, delta: DataFrame, keys: list[str], action_col: str | None = "action"
) -> DataFrame:
    """SCD1 merge: delta rows override base rows on ``keys``; unmatched
    base rows are kept, unmatched delta rows are inserts.

    A matched delta row overrides the base row WHOLESALE — including columns
    the delta legitimately sets to NULL (standard ``MERGE ... UPDATE SET``
    semantics). NULL key values are legal: keys compare null-safely (``<=>``),
    so a NULL key matches a NULL key instead of producing duplicate rows.

    Both inputs must share a schema. Returns the merged snapshot with an
    optional ``action_col`` ∈ {insert, update, keep} marking what happened
    to each output row (handy for audit counts; pass None to drop it).
    """
    if base.columns != delta.columns:
        raise ValueError(
            f"merge_upsert: schema mismatch {base.columns} vs {delta.columns}"
        )
    # The presence markers are appended to the inputs; an identically-named
    # input column would land in non_keys and be silently overwritten by
    # withColumn, corrupting both presence detection and that column's
    # output values.
    clash = {"__b_present", "__d_present"} & set(base.columns)
    if clash:
        raise ValueError(f"merge_upsert: reserved column names in input: {sorted(clash)}")
    non_keys = [c for c in base.columns if c not in keys]
    # Side presence is detected via literal marker columns, NOT key-null
    # sniffing: a NULL key value would otherwise mislabel a row. Keys join
    # null-safely (<=>) so NULL keys match each other instead of silently
    # duplicating the logical row on both sides of the full join.
    b = base.withColumn("__b_present", F.lit(True)).alias("b")
    d = delta.withColumn("__d_present", F.lit(True)).alias("d")
    joined = b.join(
        d, on=[F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys], how="full"
    )
    d_present = F.col("d.__d_present").isNotNull()
    b_present = F.col("b.__b_present").isNotNull()
    # Row-wise override: a matched delta row wins wholesale, INCLUDING columns
    # it sets to NULL (per-column coalesce would silently keep the stale base
    # value there — not MERGE ... UPDATE SET semantics).
    cols = [
        F.when(d_present, F.col(f"d.{k}")).otherwise(F.col(f"b.{k}")).alias(k)
        for k in keys
    ]
    cols += [
        F.when(d_present, F.col(f"d.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in non_keys
    ]
    if action_col:
        cols.append(
            F.when(~b_present, F.lit("insert"))
            .when(~d_present, F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias(action_col)
        )
    return joined.select(*cols)


def scd2_snapshot(
    df: DataFrame, key: str, ts_col: str, tiebreak: str
) -> DataFrame:
    """SCD2 versioning: order each key's rows by (ts, tiebreak) and derive
    ``version`` / ``valid_from`` / ``valid_to`` / ``is_current``.

    ``valid_to`` is the successor row's ``ts_col`` (open interval), NULL on
    the current row — exactly the MediaWiki revision-history shape (a page's
    revision is superseded at the next revision's timestamp, SURVEY §1.1).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return df.select(
        "*",
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
