"""Physical-plan introspection utilities.

The engine's scale posture is enforced, not hoped for: tests assert that
dimension joins broadcast, that filters reach the parquet scan
(PushedFilters), and that scans prune columns (ReadSchema). See
tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what df.explain(mode) prints)."""
    try:
        qe = df._jdf.queryExecution()
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(qe, mode)
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from every scan node."""
    return "\n".join(
        line.strip()
        for line in plan_string(df).splitlines()
        if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> str:
    return "\n".join(
        line.strip()
        for line in plan_string(df).splitlines()
        if "ReadSchema" in line
    )


def codegen_stage_count(df: DataFrame) -> int:
    return plan_string(df).count("WholeStageCodegen")
