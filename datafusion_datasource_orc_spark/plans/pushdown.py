"""Explain-plan introspection: prove pushdown reached the scan.

The reference renders ``predicate=`` into its plan display
(src/source.rs:240-255) and negotiates per-filter pushdown
(src/source.rs:257-289). Spark's equivalent signals live in
``df.explain("formatted")`` output for a FileScan:

- ``PushedFilters: [IsNotNull(x), EqualTo(x,1)]``  — predicate pushdown (A8)
- ``ReadSchema: struct<a:int,b:string>``           — projection pushdown (A7)
- ``(N) Scan orc`` / ``Location``                  — which source, which files

These helpers parse that output so tests can assert, per predicate shape,
that the filter was actually pushed (the reference's test strategy,
tests/predicate_pushdown.rs) — and that plans stay inside WholeStageCodegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _split_top_level(body: str, opens: str = "([<", closes: str = ")]>") -> list[str]:
    """Split 'A(x,1), Or(B(y,2),C(z,3))' on depth-0 commas only, tracking
    every bracket kind — In(attr, [A,R]) and map<string,int> must not split
    at their inner commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in opens:
            depth += 1
        elif ch in closes:
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _balanced_span(text: str, start: int, open_ch: str, close_ch: str) -> str:
    """Contents of the bracket pair opening at ``start`` (which must index
    ``open_ch``), respecting nesting — a regex stopping at the first closer
    truncates In(attr, [v1,v2]) lists and nested struct<...> types."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]  # unbalanced (truncated explain) → rest


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans, flattened.

    NOTE: Spark renders PushedFilters in the plan even when
    spark.sql.orc.filterPushdown=false — the display shows *candidate*
    filters; the conf gates whether the reader builds SearchArguments. (The
    reference's display is equivalent: predicate= always rendered,
    src/source.rs:240-255.)"""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        out.extend(_split_top_level(_balanced_span(text, m.end() - 1, "[", "]")))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema — the projection that reached
    the reader (column pruning proof). Balance-aware so nested struct/map
    and decimal(p,s) types neither split at inner commas nor truncate at
    the first '>'."""
    text = explain_formatted(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<", text):
        body = _balanced_span(text, m.end() - 1, "<", ">").strip()
        cols = [c.split(":")[0].strip() for c in _split_top_level(body)]
        schemas.append(cols)
    return schemas


def uses_whole_stage_codegen(df: DataFrame, execute: bool = True) -> bool:
    """True if the physical plan contains WholeStageCodegen stages (the
    '*(n)' markers). Under AQE the final plan only materializes on execution,
    so by default the plan is run first (intended for tests / plan iteration
    on small data, not production hot paths)."""
    if execute:
        # collect(), not count(): count() builds a *different* QueryExecution;
        # only executing this exact plan finalizes its AQE plan in place.
        df.collect()
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    return "*(" in text


def plan_node_lines(text: str) -> list[str]:
    """Node names from a formatted-explain TEXT's detail headers
    ('(7) SortMergeJoin') — the single parser both the tests (via
    plan_nodes) and tools/plan_report.py consume, so a Spark explain-format
    change is fixed in exactly one place."""
    return [
        m.group(1).strip()
        for m in re.finditer(
            r"^\(\d+\) ([^\n]+?)(?:\s*\[codegen id : \d+\])?$", text, re.M
        )
    ]


def plan_nodes(df: DataFrame) -> list[str]:
    """Physical-plan node names from the formatted explain's detail headers
    — each node exactly once (the tree rendering would double-count)."""
    return plan_node_lines(explain_formatted(df))


def scan_summary(df: DataFrame, execute_for_codegen: bool = False) -> dict:
    """One-call scan report for plan-quality iteration (.explain and check)."""
    nodes = plan_nodes(df)
    return {
        "formats": [n.split()[1] for n in nodes if n.startswith("Scan ")],
        "nodes": nodes,
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "whole_stage_codegen": uses_whole_stage_codegen(df) if execute_for_codegen else None,
        "broadcast_joins": sum(n.startswith("BroadcastHashJoin") for n in nodes),
        "sort_merge_joins": sum(n.startswith("SortMergeJoin") for n in nodes),
        "shuffles": sum(n == "Exchange" for n in nodes),
    }
