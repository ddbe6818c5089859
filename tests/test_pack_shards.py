"""Shard-count invariance of the pack_sequences distributed prefix sum.

Pack assignment must be a pure function of the doc_id-ordered running
token total: the shard count only sets HOW MANY tasks compute it (the
per-shard offsets compose to the same global prefix sum), so the output
is bit-identical at any parallelism. This is the property that makes
the input-scaled shard count (the round-3 fix for the hard-coded 32) a
safe knob rather than a semantics change.
"""

from __future__ import annotations

import pytest

from graph_database_akkatyped_spark.operators import llm
from tests.conftest import SF_ORACLE


def _packs(spark, n_shards):
    rows = llm.pack_sequences(spark, SF_ORACLE, n_shards=n_shards).collect()
    return sorted(
        (r["pack_id"], r["n_docs"], r["pack_tokens"], r["first_doc"], r["last_doc"])
        for r in rows
    )


@pytest.mark.parametrize("n_shards", [8, 128])
def test_pack_assignment_shard_invariant(spark, n_shards):
    assert _packs(spark, n_shards) == _packs(spark, 32)


def test_default_shard_count_scales_with_session(spark):
    docs = llm.load_table(spark, SF_ORACLE, "documents")
    n = llm._pack_shard_count(spark, docs)
    assert n >= spark.sparkContext.defaultParallelism


def test_token_budget_sample_shard_invariant(spark):
    """The budget selection must be identical at any prefix-sum shard
    count (offsets compose) — same invariance pack_sequences pins."""
    from graph_database_akkatyped_spark.operators.llm import (
        corpus_token_budget_sample,
    )

    sf = "/root/testdata/sf0.001"
    sets = []
    for n in (4, 16, 64):
        out = corpus_token_budget_sample(spark, sf, n_shards=n)
        sets.append(sorted(map(tuple, out.collect())))
    assert sets[0] == sets[1] == sets[2]
    assert len(sets[0]) > 0
