"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented SURVEY.md §2
operator with its DuckDB oracle twin (collected from the operator
modules' QUERIES/ORACLES registries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from graph_database_akkatyped_spark.operators.relational import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from graph_database_akkatyped_spark.registry import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query key (omitted -> rows-only check)."""
    from graph_database_akkatyped_spark.registry import collect

    return collect()[1]
