"""Driver contract smoke tests (t1 analog)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"c_mktsegment", "n_name", "revenue", "rnk"}


def test_registry_contract(spark):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert queries, "no queries registered"
    assert set(oracles) <= set(queries), "oracle for unknown query"
