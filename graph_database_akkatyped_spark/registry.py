"""Central query registry.

Each operator module exposes ``QUERIES: dict[str, (spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL twin; omitted
key -> driver records a weaker rows-only check). This module aggregates
them for ``__spark_entry__.py``.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "graph_database_akkatyped_spark.sources.parquet",
    "graph_database_akkatyped_spark.operators.relational",
    "graph_database_akkatyped_spark.operators.graph_build",
    "graph_database_akkatyped_spark.operators.algos",
    "graph_database_akkatyped_spark.operators.llm",
    "graph_database_akkatyped_spark.functions.scalar",
    "graph_database_akkatyped_spark.functions.udfs",
    "graph_database_akkatyped_spark.streaming.windows",
    "graph_database_akkatyped_spark.streaming.stateful",
)


def collect() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for name in _MODULES:
        try:
            mod = import_module(name)
        except ModuleNotFoundError:
            continue
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in queries:
                raise ValueError(f"duplicate query_key {key!r} in {name}")
            queries[key] = fn
        for key, sql in getattr(mod, "ORACLES", {}).items():
            if key in oracles:
                raise ValueError(f"duplicate oracle key {key!r} in {name}")
            oracles[key] = sql
    return queries, oracles
