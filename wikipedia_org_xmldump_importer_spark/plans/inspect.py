"""Physical-plan inspection helpers (SURVEY.md §5.4).

The engine's scale discipline is enforceable only if the *physical* plan is
checkable in tests: did the dim join broadcast, did the filter reach the
parquet scan, did the projection prune columns, is the hot expression inside
whole-stage codegen. These helpers parse the executed-plan string so tests
(and operators' own assertions) don't re-implement string munging.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, materialize: bool = False) -> str:
    """The physical plan string. With ``materialize=True`` the plan is
    executed first so AQE's final plan (with codegen span ids and runtime
    join re-selections) is returned instead of the pre-execution sketch."""
    if materialize:
        # collect(), not a sink write: a write plans a NEW query execution,
        # leaving this DataFrame's own AQE plan unfinalized. Callers pass
        # materialize=True on small/test data only.
        df.collect()
    # Scan metadata (PushedFilters / ReadSchema / DataFilters) truncates at
    # spark.sql.maxMetadataStringLength (default 100 chars) — a 3-predicate
    # filter eats the whole budget and PushedFilters silently vanishes from
    # the string, making assertions pass/fail on string length, not plan
    # shape. Widen for the duration of the render.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (one list entry per scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning ground truth."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", executed_plan(df))


def whole_stage_codegen_spans(df: DataFrame, materialize: bool = True) -> int:
    """Number of whole-stage-codegen spans in the (final) plan. In the
    executed-plan string spans print as ``*(n)`` operator prefixes."""
    plan = executed_plan(df, materialize=materialize)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
