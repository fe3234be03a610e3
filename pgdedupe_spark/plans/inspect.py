"""Physical-plan inspection (the `.explain("formatted")` feedback loop).

The engine has no custom Catalyst rules (SURVEY.md §4 — none are needed),
so plan *quality* is enforced empirically: these helpers read the formatted
plan and let tests assert the physical properties that matter at 100 TB —
filters reaching the parquet scan, schemas pruned to the projection,
broadcast joins where a side is dim-sized, whole-stage codegen coverage.
`tests/test_plans.py` pins them for the headline queries so a regression
(e.g. an expression change that breaks pushdown) fails CI, not production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan ReadSchema column lists — the column-pruning audit."""
    cols = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        fields = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        cols.append(fields)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """Whole-stage-codegen span count. With AQE on, the plan carries no
    codegen annotations until the adaptive plan is final — pass
    ``execute=True`` to run the query (count) and inspect the final plan."""
    if execute:
        # collect() (not count()) — count wraps the frame in a NEW query
        # execution; only executing THIS plan finalizes its AQE annotations
        df.collect()
    ids = set(re.findall(r"codegen id : (\d+)", explain_str(df)))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "simple")))
    return len(ids)


def plan_report(df: DataFrame, execute: bool = False) -> dict:
    """One-stop summary used by the plan-audit test and PLANS.md dump.
    ``execute=True`` additionally runs the query so AQE-final facts
    (codegen spans) are real rather than zero."""
    report = {
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
        "codegen_stages": codegen_stage_count(df, execute=execute),
    }
    plan = explain_str(df)  # after execution this is the AQE-final plan
    report.update(
        broadcast_join="BroadcastHashJoin" in plan,
        sort_merge_join="SortMergeJoin" in plan,
        python_udf="BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    )
    return report
