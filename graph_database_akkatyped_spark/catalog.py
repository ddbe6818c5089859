"""Fixture catalog: load the ten driver tables and register temp views.

Tables + schemas: /root/repo/FIXTURES.md. ``events.ts`` has shipped in
two storage vintages (see FIXTURES.md): ns-precision INT64 (round 1)
and µs TIMESTAMP_NTZ (round 2+). ``normalize_events_ts`` adapts per
vintage so every consumer sees a session-TZ TIMESTAMP; the DuckDB
oracle's matching cast is ``CAST(ts AS TIMESTAMP)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, set defensively so the
    contract also holds on a caller-provided session (the driver builds
    its own SparkSession without our session.py defaults)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-TZ TIMESTAMP regardless of
    how the fixture stored it. Driver fixtures have shipped two ways:

    - ns-precision INT64 (round 1): with nanosAsLong it arrives as
      BIGINT; ``div 1000`` to µs is lossless (values are µs-resolution)
    - µs-precision TIMESTAMP_NTZ (round 2+): cast NTZ→TIMESTAMP, which
      under the UTC session timezone is a value-preserving relabel

    The NTZ→TIMESTAMP cast is value-preserving ONLY under a UTC session
    timezone, so this function enforces it itself (via the owning
    session's confs) rather than trusting every caller to have run
    ``_ensure_session_confs`` first.
    """
    _ensure_session_confs(df.sparkSession)
    kind = dict(df.dtypes).get("ts")
    if kind == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if kind == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (SQL entry point)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
