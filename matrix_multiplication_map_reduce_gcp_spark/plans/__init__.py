"""Physical-plan introspection: assertions that the plans we ship are
the plans we want (pushdown, pruning, broadcast, codegen)."""

from .explain import (
    executed_plan,
    formatted_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
