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


def test_lpt_snake_balance_and_totals(spark):
    """pack_lpt_shards invariants: doc counts equal +-1 by round-robin
    construction, token totals cover the corpus exactly, and the snake
    draft keeps the max-min token spread within the largest single
    document (each K-block deals one doc per shard; alternation pairs
    each block's big end with the next block's small end)."""
    from pyspark.sql import functions as F

    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.llm import pack_lpt_shards
    from tests.conftest import SF_ORACLE

    out = pack_lpt_shards(spark, SF_ORACLE).collect()
    assert {r.shard for r in out} == set(range(8))
    counts = [r.n_docs for r in out]
    assert max(counts) - min(counts) <= 1
    docs = load_table(spark, SF_ORACLE, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("long"))
    ).first()[0]
    assert sum(r.tok_sum for r in out) == total
    assert sum(counts) == docs.count()
    spread = max(r.tok_sum for r in out) - min(r.tok_sum for r in out)
    assert spread <= max(r.max_tok for r in out)
