"""Physical-plan inspection helpers.

The engine's performance contract is checked, not assumed: tests assert
that filters/projections reach the parquet scan, small dims broadcast, and
hot paths stay inside WholeStageCodegen. These helpers parse
``explain("formatted")`` output for those properties.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries at least one pushed filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for fieldspec in inner.split(","):
                if ":" in fieldspec:
                    cols.append(fieldspec.split(":", 1)[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
