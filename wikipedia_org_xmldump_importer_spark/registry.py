"""Operator/query registry — the bridge between SURVEY.md §2 and the driver
contract in ``__spark_entry__.py``.

Each §2 row registers exactly one named query callable ``(spark, sf_dir) ->
DataFrame`` and (where the row is marked ``oracle: SQL``) one DuckDB oracle
SQL string computing the same result with identically-aliased columns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):
    """Decorator: add a query to the registry.

    ``oracle`` is ANSI SQL runnable by DuckDB 1.0.0 against the ten
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). ``None`` => rows-only check
    (SURVEY §2 marks which rows are not SQL-expressible and why).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module exactly once to populate REGISTRY."""
    global _loaded
    if _loaded:
        return
    from .queries import load_all  # noqa: PLC0415

    load_all()
    _loaded = True
