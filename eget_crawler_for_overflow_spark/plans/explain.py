"""Plan inspection helpers: capture ``explain`` output and assert the
physical properties that matter at 100 TB (filter pushdown into the scan,
column pruning, broadcast vs shuffle joins, whole-stage codegen spans).

Used by tests/test_plans.py so plan regressions fail CI, not production.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    txt = plan_text(df)
    for line in txt.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def read_schema(df: DataFrame) -> str:
    txt = plan_text(df)
    for line in txt.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def codegen_stage_count(df: DataFrame) -> int:
    return plan_text(df, "simple").count("WholeStageCodegen")
