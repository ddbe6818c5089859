"""Partition-invariance: results must be bit-identical regardless of
parallelism — the property that makes the oracle hash checks stable on
local[32] AND on a 1000-executor cluster (numerics.py's whole point)."""

from __future__ import annotations

import pytest

from graph_database_akkatyped_spark.registry import collect
from tests.conftest import SF_SMOKE
from tests.oracle_utils import canonical_rows

QUERIES, _ = collect()

# float-aggregating / iterative keys — the ones partitioning could break
_KEYS = [
    "agg_hash",
    "flagship",
    "pagerank_fixed",
    "window_running",
    "simsearch_pairs_label",
    "text_lang_stats",
    # round-2 extensions with float/rank outputs or iterative kernels
    "pagerank_personalized",
    "simsearch_hybrid_rrf",
    "events_anomaly_hours",
    "corpus_mix_weights",
    "rfm_segmentation",
]


@pytest.mark.parametrize("key", _KEYS)
def test_partition_count_invariance(spark, key):
    fn = QUERIES[key]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canonical_rows(fn(spark, SF_SMOKE).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = canonical_rows(fn(spark, SF_SMOKE).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b, f"{key} result depends on partition count"
