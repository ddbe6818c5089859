"""Mimic the driver's correctness check: row-count + column-name set +
order-insensitive value comparison between a Spark DataFrame and the
DuckDB oracle result (driver contract: __spark_entry__.py docstring)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            s = s.astype("datetime64[us]")
        elif s.dtype == np.float32:
            s = s.astype(np.float64)
        elif np.issubdtype(s.dtype, np.integer):
            s = s.astype(np.int64)
        out[c] = s
    return pd.DataFrame(out)


def _cell_key(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        return ("f", repr(v))
    if isinstance(v, (list, np.ndarray)):
        return ("a", tuple(_cell_key(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _cell_key(x)) for k, x in v.items())))
    if v is pd.NaT:
        return ("\x00null",)
    return ("v", str(type(v).__name__), str(v))


def canonical_rows(df: pd.DataFrame) -> list:
    df = _normalize(df)
    rows = [
        tuple(_cell_key(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = ok)."""
    problems: list[str] = []
    sc, oc = set(spark_pd.columns), set(oracle_pd.columns)
    if sc != oc:
        problems.append(f"column sets differ: spark-only={sc - oc} oracle-only={oc - sc}")
        return problems
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"row counts differ: spark={len(spark_pd)} oracle={len(oracle_pd)}")
    a, b = canonical_rows(spark_pd), canonical_rows(oracle_pd)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        msg = f"values differ ({len(a)} vs {len(b)} rows)"
        for i in diffs:
            msg += f"\n  row[{i}] spark={a[i]}\n  row[{i}] oracle={b[i]}"
        if not diffs and len(a) != len(b):
            extra = a[len(b):] if len(a) > len(b) else b[len(a):]
            msg += f"\n  extra rows: {extra[:3]}"
        problems.append(msg)
    return problems
