"""Physical-plan inspection helpers (SURVEY.md §4).

The optimizer work in this engine is mostly "let Catalyst do it, then
PROVE it did": these helpers extract the formatted physical plan so
tests (tests/test_plans.py) can assert the properties that matter at
100 TB — filter/projection pushdown into parquet, broadcast joins for
small dims, TakeOrderedAndProject for top-k, partial+final aggregation,
and whole-stage codegen coverage.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (first scan node)."""
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [f.split(":")[0] for f in inner.split(",") if f]
    return []


def uses(df: DataFrame, operator: str) -> bool:
    return operator in formatted_plan(df)


def count_occurrences(df: DataFrame, operator: str) -> int:
    return formatted_plan(df).count(operator)
