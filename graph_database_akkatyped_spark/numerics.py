"""Deterministic numeric helpers for oracle (hash) parity.

Floating-point SUM/AVG results depend on addition order, which differs
between Spark (partial + final agg across partitions) and DuckDB — and
between runs once partitioning changes. Rounding after the fact only
papers over it. Instead: cast to exact DECIMAL before aggregating, do
the exact sum, and cast the result back to DOUBLE. Both engines then
produce bit-identical doubles regardless of partitioning — which also
means the same query hashes identically on a 1000-executor cluster.

Per-row double arithmetic (e.g. ``l_extendedprice * (1-l_discount)``)
is IEEE-754 deterministic across engines and needs no treatment.

The final decimal->double conversion goes VIA STRING: a direct
decimal->double cast is correctly rounded in the JVM but can be 1 ulp
off in DuckDB (int128/10^scale double division); parsing the exact
decimal string is correctly rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec2double(c: Column) -> Column:
    """Exact-decimal column -> bit-deterministic double (via string)."""
    return c.cast("string").cast("double")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum: DECIMAL(30,scale) accumulate -> DOUBLE result."""
    c = F.col(col) if isinstance(col, str) else col
    return dec2double(F.sum(c.cast(f"decimal(30,{scale})")))


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum / count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return dec2double(F.sum(c.cast(f"decimal(30,{scale})"))) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
