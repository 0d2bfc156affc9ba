"""Physical-plan introspection (SURVEY.md §4 discipline)."""

from kitkat_spark.plans.explain import (
    broadcast_join_count,
    explain_str,
    has_pushed_filters,
    plan_facts,
    shuffle_count,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "explain_str",
    "has_pushed_filters",
    "plan_facts",
    "shuffle_count",
    "wholestage_codegen_count",
]
