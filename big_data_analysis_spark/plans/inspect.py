"""Inspect a DataFrame's physical plan for the scale-critical properties
(SURVEY.md §4.2, the driver's north star):

- predicate pushdown  : filters must reach the parquet scan
  (``PushedFilters: [...]``), not run after a full-table read;
- column pruning      : ``ReadSchema`` must contain only needed columns;
- join strategy       : small dims must broadcast (no shuffle);
- whole-stage codegen : hot expressions must compile, not interpret.

These are string-level probes of ``explain('formatted')`` — stable
enough across Spark 4.x for test assertions, and exactly what a human
reviews when tuning a plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of ``explain('formatted')`` without printing it."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def scan_infos(df: DataFrame) -> list[dict]:
    """One dict per file scan: location, pushed filters, read schema."""
    plan = formatted_plan(df)
    scans = []
    # Formatted explain lists each scan's details in an indented block.
    for block in re.split(r"\n\n", plan):
        if not re.search(r"Scan (parquet|csv|binaryFile)", block):
            continue
        # The plan tree header also names the scan; only the detail
        # block (with ReadSchema) describes it.
        if "ReadSchema" not in block:
            continue
        info = {"pushed_filters": None, "read_schema": None, "location": None}
        m = re.search(r"PushedFilters: \[(.*?)\]", block)
        if m:
            info["pushed_filters"] = [f.strip() for f in m.group(1).split(",") if f.strip()]
        m = re.search(r"ReadSchema: struct<(.*?)>", block)
        if m:
            info["read_schema"] = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        m = re.search(r"Location: \S+ \[(.*?)\]", block)
        if m:
            info["location"] = m.group(1)
        scans.append(info)
    return scans


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast hash/nested-loop joins in the plan."""
    plan = formatted_plan(df)
    return len(re.findall(r"Broadcast(?:Hash|NestedLoop)Join", plan))


def has_wholestage_codegen(df: DataFrame) -> bool:
    """True when at least one operator sits in a WholeStageCodegen span.
    Formatted explain marks codegen'd operators with a ``*`` prefix
    (simple mode spells out WholeStageCodegen); accept either marker."""
    plan = formatted_plan(df)
    return "WholeStageCodegen" in plan or re.search(r"(?:^|[+:]- )\* ", plan) is not None