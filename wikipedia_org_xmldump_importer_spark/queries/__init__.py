"""Query modules — one module per SURVEY.md §2 section group.

Importing ``load_all()`` populates ``registry.REGISTRY``.
"""

from __future__ import annotations

import importlib

MODULES = (
    "flagship",
    "scans",
    "projection",
    "joins",
    "aggregates",
    "windows",
    "sortlimit",
    "setops",
    "scalar_fns",
    "streaming_batch",
    "udfs",
    "llm",
    "textops",
)


def load_all() -> None:
    for mod in MODULES:
        importlib.import_module(f".{mod}", __name__)
