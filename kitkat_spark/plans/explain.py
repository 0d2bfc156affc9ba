"""Helpers that read a DataFrame's physical plan and answer the questions the
100 TB checklist asks of every operator (SURVEY.md §4, repo north star):

- did the filter/projection reach the parquet scan (PushedFilters/ReadSchema)?
- is the small side of the join broadcast?
- how many shuffles (Exchange) does the plan pay?
- how much of the plan is inside whole-stage codegen?

These are assertions for tests and a debugging surface — the optimizer does
the work; we verify it wasn't accidentally defeated (e.g. a Python UDF
between scan and filter kills pushdown silently).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan carries non-empty PushedFilters including every
    given fragment (case-insensitive substring match on the filter list)."""
    plan = explain_str(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = "; ".join(pushed)
    if not any(p.strip() for p in pushed):
        return False
    return all(f.lower() in joined.lower() for f in fragments)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle of its input)."""
    return len(re.findall(r"\bExchange\b", explain_str(df, "simple")))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", explain_str(df, "simple")))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (simple mode prints them as a
    ``*(n)`` operator prefix) — wider/fewer is better."""
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))


def plan_facts(df: DataFrame) -> dict:
    """One-call summary used by tests and bench diagnostics."""
    simple = explain_str(df, "simple")
    formatted = explain_str(df)
    return {
        "shuffles": len(re.findall(r"\bExchange\b", simple)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", simple)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", simple)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "python_udf_nodes": len(re.findall(r"BatchEvalPython|ArrowEvalPython", simple)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", formatted),
    }
