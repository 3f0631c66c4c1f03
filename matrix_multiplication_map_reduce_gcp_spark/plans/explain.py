"""Helpers over the executed physical plan string.

These power tests/test_plans.py — the "would this survive 100×?"
audit: filters must reach the parquet scan, scans must prune columns,
dim joins must broadcast, hot paths must stay inside whole-stage
codegen. A query that silently regresses any of these fails CI, not a
production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') text: untruncated ReadSchema + codegen ids."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears inside some PushedFilters: [...]."""
    plan = executed_plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    return all(frag in pushed for frag in fragments)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan (for
    column-pruning assertions)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (presence is the
    baseline check; wider spans are better).

    Under AQE the codegen markers only exist in the FINAL plan, so
    this executes the frame first, then reads the finalized adaptive
    plan (`*(n)` span markers)."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", final)))
