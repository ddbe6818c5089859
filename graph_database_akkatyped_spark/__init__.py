"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``zhao258147/graph-database-akkatyped`` reference.

The reference (an Akka Typed actor property-graph store; source
unavailable locally — see SURVEY.md §0) is re-expressed Spark-first:

- graph state (vertex actors + adjacency) -> vertex/edge DataFrames
  (``operators.graph_build``)
- message-passing traversals -> a DataFrame Pregel kernel
  (``operators.pregel``) and algorithms built on it (``operators.algos``)
- the event journal -> batch + Structured Streaming over the ``events``
  fixture (``streaming``)
- plus the relational core, scalar-function surface, and
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) mandated by BASELINE.json.

Every public query is registered in ``registry.QUERIES`` with a DuckDB
oracle twin in ``registry.ORACLES`` (driver contract:
``__spark_entry__.py``).
"""

from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.catalog import load_tables, register_views


def __getattr__(name):
    # lazy: GraphDB/pregel pull in operator modules, which need pyspark
    # runtime bits callers may configure first
    if name == "GraphDB":
        from graph_database_akkatyped_spark.api import GraphDB

        return GraphDB
    if name == "pregel":
        from graph_database_akkatyped_spark.operators.pregel import pregel

        return pregel
    raise AttributeError(name)


__all__ = ["get_spark", "load_tables", "register_views", "GraphDB", "pregel"]
