from .inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema,
    whole_stage_codegen_spans,
)
